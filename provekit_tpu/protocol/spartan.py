"""ZK-Spartan sumcheck: reduce R1CS satisfaction to weighted witness openings.

Faithful port of the protocol math in the reference prover
(``provekit/prover/src/whir_r1cs.rs:103-369``) and verifier
(``provekit/verifier/src/whir_r1cs.rs:110-172``):

* Prove sum over the hypercube of F(x) = eq(r,x) * (Az(x) Bz(x) - Cz(x)) is 0,
  blinded by a random polynomial G = sum of per-round cubics, combined with a
  challenge rho: the sumcheck target is rho * sum(G).
* The blinding polynomial is itself committed (masked, batch 2) and opened via
  a second WHIR instance with tensor-of-powers weights proving
  sum_i g_i(alpha_i).

Device kernels do the per-round O(n) work (``ops.sumcheck.spartan_round``);
host code does the tiny cubic-coefficient algebra and the sponge.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..ops import sumcheck as sc
from ..whir import (DenseWeights, Statement, WhirConfig, committer, prover,
                    verifier)
from ..whir.verifier import WhirError

HALF = F.HALF


def eval_cubic(coeffs, x):
    return sc.eval_cubic(coeffs, x)


def blinding_coefficients_for_round(g_cubics, idx, alphas):
    """Round polynomial of G = sum_i g_i(X_i) partial-bound at alphas.

    Port of ``compute_blinding_coefficients_for_round``
    (prover/src/whir_r1cs.rs:103-171).
    """
    n = len(g_cubics)
    all_fixed = idx == n
    if all_fixed:
        idx = n - 1
    prefix_sum = 0
    for i in range(idx):
        prefix_sum += eval_cubic(g_cubics[i], alphas[i])
    suffix_sum = 0
    for g in g_cubics[idx + 1:]:
        suffix_sum += eval_cubic(g, 0) + eval_cubic(g, 1)
    prefix_multiplier = pow(2, n - 1 - idx, F.P)
    suffix_multiplier = prefix_multiplier * HALF % F.P
    const_term = (prefix_multiplier * prefix_sum
                  + suffix_multiplier * suffix_sum) % F.P
    g = g_cubics[idx]
    coeffs = [(prefix_multiplier * g[0] + const_term) % F.P,
              prefix_multiplier * g[1] % F.P,
              prefix_multiplier * g[2] % F.P,
              prefix_multiplier * g[3] % F.P]
    if all_fixed:
        return [eval_cubic(coeffs, alphas[idx]), 0, 0, 0]
    return coeffs


def sum_over_hypercube(g_cubics):
    c = blinding_coefficients_for_round(g_cubics, 0, [])
    return (eval_cubic(c, 0) + eval_cubic(c, 1)) % F.P


def expand_powers(values):
    """[1, a, a^2, a^3] per alpha (prover/src/whir_r1cs.rs:371-380)."""
    out = []
    for v in values:
        out.extend([1, v, v * v % F.P, v * v * v % F.P])
    return out


def random_evals(num_vars: int, rng=None) -> list[int]:
    rb = rng.randrange if rng is not None else (
        lambda p: secrets.randbelow(p))
    return [rb(F.P) for _ in range(1 << num_vars)]


def batch_commit_to_polynomial(m, whir_config, poly_evals_ints, transcript,
                               rng=None):
    """Commit [poly || mask] and a fresh random polynomial as a batch of two.

    Port of ``batch_commit_to_polynomial`` (prover/src/whir_r1cs.rs:182-209):
    hides the polynomial behind a one-variable-extended mask, plus a fully
    random companion for batching-randomness hiding.
    """
    nv = len(poly_evals_ints).bit_length() - 1
    assert len(poly_evals_ints) == 1 << nv and m == nv + 1
    mask = random_evals(nv, rng)
    masked = list(poly_evals_ints) + mask
    rand_poly = random_evals(m, rng)
    masked_arr = V.pack([F.to_mont(v) for v in masked])
    rand_arr = V.pack([F.to_mont(v) for v in rand_poly])
    com = committer.commit(transcript, whir_config, [masked_arr, rand_arr])
    return com, masked, rand_poly


def add_zk_sumcheck_pattern(ds, m_0: int) -> None:
    """add_zk_sumcheck_polynomials (common/src/utils/sumcheck.rs:123-129)."""
    ds.absorb(1, "Sum of G over boolean hypercube")
    ds.squeeze(1, "Rho")
    for _ in range(m_0):
        ds.absorb(4, "Sumcheck Polynomials").squeeze(1, "Sumcheck Random")
    ds.absorb(2, "Polynomial sums")


@dataclass
class SpartanProverOutput:
    r: list[int]
    alpha: list[int]


def _blinding_statement(m_commit, alphas, masked, rand_poly, com):
    """Statement over the blinding commitment with tensor-of-powers weights."""
    w_vals = expand_powers(alphas)
    size = 1 << m_commit
    w_vals = w_vals + [0] * (size - len(w_vals))
    f_sum = sum(w * v for w, v in zip(w_vals, masked)) % F.P
    g_sum = sum(w * v for w, v in zip(w_vals, rand_poly)) % F.P
    stmt = Statement(m_commit)
    weights = DenseWeights.from_ints(w_vals, m_commit)
    sigma = (f_sum + com.batching_randomness * g_sum) % F.P
    stmt.add_constraint(weights, sigma)
    return stmt, f_sum, g_sum


def run_zk_sumcheck_prover(r1cs, z, transcript, m_0: int,
                           blinding_config: WhirConfig, rng=None):
    """Port of ``run_zk_sumcheck_prover`` (prover/src/whir_r1cs.rs:228-369)."""
    r = transcript.challenge_scalars(m_0)
    a, b, c = r1cs.witness_bounds(z)
    n = 1 << m_0
    import jax.numpy as jnp
    pad = n - a.shape[1]
    if pad:
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
        c = jnp.pad(c, [(0, 0), (0, pad)])
    eq = sc.eq_table(r)

    g_cubics = [[(rng.randrange(F.P) if rng is not None
                  else secrets.randbelow(F.P)) for _ in range(4)]
                for _ in range(m_0)]

    flat = [x for g in g_cubics for x in g]
    nv = max(1, (len(flat) - 1).bit_length())
    flat = flat + [0] * ((1 << nv) - len(flat))
    m_commit = nv + 1
    assert blinding_config.num_variables == m_commit, \
        (blinding_config.num_variables, m_commit)
    com, masked, rand_poly = batch_commit_to_polynomial(
        m_commit, blinding_config, flat, transcript, rng)

    sum_g = sum_over_hypercube(g_cubics)
    transcript.add_scalars([sum_g])
    rho = transcript.challenge_scalars(1)[0]

    claim = rho * sum_g % F.P
    alphas: list[int] = []
    abce = jnp.stack([a, b, c, eq], axis=1)  # one dispatch per round

    if n > sc.HOST_TAIL:
        # fused: all m_0 rounds + sponge advance in one device dispatch
        from ..ops import fused
        st = transcript.sponge_state_array()
        pms = [pow(2, m_0 - 1 - i, F.P) for i in range(m_0)]
        sms = [p * F.HALF % F.P for p in pms]
        sfx = []
        for i in range(m_0):
            s = 0
            for g in g_cubics[i + 1:]:
                s += eval_cubic(g, 0) + eval_cubic(g, 1)
            sfx.append(s % F.P)
        g_arr = V.pack([F.to_mont(x) for g in g_cubics for x in g]
                       ).reshape(16, m_0, 4)
        state2, coeffs_arr = fused.spartan_sumcheck_fused(
            abce, st, V.pack([F.to_mont(claim)]),
            V.pack([F.to_mont(rho)]),
            g_arr,
            V.pack([F.to_mont(p) for p in pms]),
            V.pack([F.to_mont(s) for s in sms]),
            V.pack([F.to_mont(s) for s in sfx]), m_0)
        vals = V.unpack(coeffs_arr.reshape(16, m_0 * 4))
        for i in range(m_0):
            cs = vals[4 * i:4 * i + 4]
            assert (2 * cs[0] + cs[1] + cs[2] + cs[3]) % F.P == claim
            transcript.add_scalars(cs)
            alpha_i = transcript.challenge_scalars(1)[0]
            alphas.append(alpha_i)
            claim = eval_cubic(cs, alpha_i)
        stmt, f_sum, g_sum = _blinding_statement(
            m_commit, alphas, masked, rand_poly, com)
        transcript.add_scalars([f_sum, g_sum])
        prover.prove(transcript, blinding_config, com, stmt)
        return SpartanProverOutput(r=r, alpha=alphas)

    # host tail: ONE transfer in, all m_0 rounds in host ints (per-round
    # device syncs are round-trip-bound on remote devices)
    xs = [F.from_mont(v) for v in V.unpack(abce.reshape(16, 4 * n))]
    av, bv, cv, ev = (xs[j * n:(j + 1) * n] for j in range(4))
    for idx in range(m_0):
        h = len(av) // 2
        f0 = fm1 = finf = 0
        for i in range(h):
            a0, a1 = av[i], av[i + h]
            b0, b1 = bv[i], bv[i + h]
            c0_, c1_ = cv[i], cv[i + h]
            e0, e1 = ev[i], ev[i + h]
            f0 += e0 * (a0 * b0 - c0_)
            fm1 += (2 * e0 - e1) * ((2 * a0 - a1) * (2 * b0 - b1)
                                    - (2 * c0_ - c1_))
            finf += (e1 - e0) * (a1 - a0) * (b1 - b0)
        f0, fm1, finf = f0 % F.P, fm1 % F.P, finf % F.P

        g_poly = blinding_coefficients_for_round(g_cubics, idx, alphas)
        c0 = (f0 + rho * g_poly[0]) % F.P
        g_at_m1 = (g_poly[0] - g_poly[1] + g_poly[2] - g_poly[3]) % F.P
        comb_m1 = (fm1 + rho * g_at_m1) % F.P
        c2 = HALF * (claim + comb_m1 - 3 * c0) % F.P
        c3 = (finf + rho * g_poly[3]) % F.P
        c1 = (claim - 2 * c0 - c3 - c2) % F.P
        assert (2 * c0 + c1 + c2 + c3) % F.P == claim

        transcript.add_scalars([c0, c1, c2, c3])
        alpha_i = transcript.challenge_scalars(1)[0]
        alphas.append(alpha_i)
        av = [(av[i] + alpha_i * (av[i + h] - av[i])) % F.P for i in range(h)]
        bv = [(bv[i] + alpha_i * (bv[i + h] - bv[i])) % F.P for i in range(h)]
        cv = [(cv[i] + alpha_i * (cv[i + h] - cv[i])) % F.P for i in range(h)]
        ev = [(ev[i] + alpha_i * (ev[i + h] - ev[i])) % F.P for i in range(h)]
        claim = eval_cubic([c0, c1, c2, c3], alpha_i)

    stmt, f_sum, g_sum = _blinding_statement(
        m_commit, alphas, masked, rand_poly, com)
    transcript.add_scalars([f_sum, g_sum])
    prover.prove(transcript, blinding_config, com, stmt)
    return SpartanProverOutput(r=r, alpha=alphas)


@dataclass
class SpartanVerifierOutput:
    r: list[int]
    alpha: list[int]
    last_sumcheck_val: int


def run_zk_sumcheck_verifier(transcript, m_0: int,
                             blinding_config: WhirConfig):
    """Port of ``run_sumcheck_verifier`` (verifier/src/whir_r1cs.rs:110-172),
    completing the blinding-weight evaluation the reference defers."""
    r = transcript.challenge_scalars(m_0)
    com = verifier.parse_commitment(transcript, blinding_config)
    [sum_g] = transcript.next_scalars(1)
    rho = transcript.challenge_scalars(1)[0]
    claim = rho * sum_g % F.P
    alphas = []
    for _ in range(m_0):
        coeffs = transcript.next_scalars(4)
        if (2 * coeffs[0] + coeffs[1] + coeffs[2] + coeffs[3]) % F.P != claim:
            raise WhirError("Spartan sumcheck equality assertion failed")
        alpha_i = transcript.challenge_scalars(1)[0]
        alphas.append(alpha_i)
        claim = eval_cubic(coeffs, alpha_i)

    f_sum, g_sum = transcript.next_scalars(2)
    m_commit = blinding_config.num_variables
    w_vals = expand_powers(alphas)
    w_vals = w_vals + [0] * ((1 << m_commit) - len(w_vals))
    stmt = Statement(m_commit)
    stmt.add_constraint(DenseWeights.from_ints(w_vals, m_commit),
                        (f_sum + com.batching_randomness * g_sum) % F.P)
    verifier.verify(transcript, blinding_config, com, stmt)

    last = (claim - rho * f_sum) % F.P
    return SpartanVerifierOutput(r=r, alpha=alphas, last_sumcheck_val=last)
