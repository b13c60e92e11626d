"""WHIR protocol parameter derivation.

Mirrors the parameter surface the reference exports to the recursive verifier
(``tooling/provekit-gnark/src/gnark_config.rs:32-98``: n_rounds, per-round
ood_samples/num_queries/pow_bits, final_queries, final_pow_bits,
final_folding_pow_bits, domain_generator, batch_size) and the scheme-level
choices (``provekit/r1cs-compiler/src/whir_r1cs.rs:38-54``: security 128,
ConjectureList soundness, constant folding factor 4, starting rate 1/2).

Derivation follows the WHIR/STIR conjectured-soundness accounting:
each in-domain query at log-inverse-rate L contributes L bits; grinding
tops up the remainder, capped at ``max_pow_bits``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..fields import bn254 as F


@dataclass(frozen=True)
class RoundConfig:
    ood_samples: int
    num_queries: int
    pow_bits: float
    log_domain_size: int      # domain size of the oracle being queried
    log_inv_rate: int         # of the oracle being queried
    folding_factor: int


@dataclass
class WhirConfig:
    num_variables: int
    batch_size: int = 1
    security_level: int = 128
    max_pow_bits: int = 17
    starting_log_inv_rate: int = 1
    folding_factor: int = 4
    commitment_ood_samples: int = 1

    # derived
    initial_folding_factor: int = field(init=False)
    final_sumcheck_rounds: int = field(init=False)
    n_rounds: int = field(init=False)
    rounds: list = field(init=False)
    final_queries: int = field(init=False)
    final_pow_bits: float = field(init=False)
    final_folding_pow_bits: float = field(init=False)
    starting_log_domain: int = field(init=False)
    domain_generator: int = field(init=False)

    def __post_init__(self):
        m, ff = self.num_variables, self.folding_factor
        assert m >= 1
        self.initial_folding_factor = min(ff, m)
        rest = m - self.initial_folding_factor
        self.final_sumcheck_rounds = rest % ff
        self.n_rounds = rest // ff
        self.starting_log_domain = m + self.starting_log_inv_rate
        assert self.starting_log_domain <= F.TWO_ADICITY
        self.domain_generator = F.root_of_unity(self.starting_log_domain)

        def queries_and_pow(log_inv_rate: int) -> tuple[int, float]:
            bits = log_inv_rate  # ConjectureList: each query gives L bits
            target = self.security_level
            nq = max(1, math.ceil((target - self.max_pow_bits) / bits))
            pow_bits = max(0.0, float(target - nq * bits))
            return nq, pow_bits

        self.rounds = []
        log_domain = self.starting_log_domain
        log_inv_rate = self.starting_log_inv_rate
        for _ in range(self.n_rounds):
            nq, pw = queries_and_pow(log_inv_rate)
            self.rounds.append(RoundConfig(
                ood_samples=1, num_queries=nq, pow_bits=pw,
                log_domain_size=log_domain, log_inv_rate=log_inv_rate,
                folding_factor=ff))
            log_domain -= 1
            log_inv_rate += ff - 1
        self.final_log_domain = log_domain
        self.final_log_inv_rate = log_inv_rate
        nq, pw = queries_and_pow(log_inv_rate)
        self.final_queries = nq
        self.final_pow_bits = pw
        self.final_folding_pow_bits = 0.0

    # -- helpers -----------------------------------------------------------

    def round_domain_generator(self, r: int) -> int:
        """Generator of the domain of the r-th committed oracle (0 = initial)."""
        return F.root_of_unity(self.starting_log_domain - r)

    def describe(self) -> dict:
        """The WHIRConfigGnark-shaped summary (gnark_config.rs:60-98)."""
        return {
            "n_rounds": self.n_rounds,
            "rate": self.starting_log_inv_rate,
            "n_vars": self.num_variables,
            "folding_factor": [self.initial_folding_factor]
                              + [r.folding_factor for r in self.rounds],
            "ood_samples": [r.ood_samples for r in self.rounds],
            "num_queries": [r.num_queries for r in self.rounds],
            "pow_bits": [int(r.pow_bits) for r in self.rounds],
            "final_queries": self.final_queries,
            "final_pow_bits": int(self.final_pow_bits),
            "final_folding_pow_bits": int(self.final_folding_pow_bits),
            "domain_generator": str(self.domain_generator),
            "batch_size": self.batch_size,
        }
