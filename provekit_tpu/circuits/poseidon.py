"""Poseidon2-shaped hash-chain circuits: the flagship benchmark workload.

The reference's headline benchmark is ``prove_poseidon_1000`` — a Noir
program hashing with Poseidon2 1000 times (``noir-examples/poseidon-rounds/
src/main.nr``, ``tooling/provekit-bench/benches/bench.rs:17-34``).  This
module builds the equivalent ACIR circuit programmatically: a t=3 Poseidon2
permutation (x^5 S-box, 8 full + 56 partial rounds, MDS-style linear layers)
iterated N times, together with the full ACIR witness assignment.

Round constants are deterministic pseudo-constants (sha256 counter mod p),
NOT the official Poseidon2 constants — the circuit has identical shape and
cost (constraint count, witness count, matrix structure), which is what the
benchmark measures.  Swap in official constants for interop.
"""

from __future__ import annotations

import hashlib

from ..acir import model as acir
from ..fields import bn254 as F

T = 3
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 56


def _pseudo_constants(n: int) -> list[int]:
    out = []
    i = 0
    while len(out) < n:
        h = hashlib.sha256(b"provekit-tpu-poseidon-%d" % i).digest()
        v = int.from_bytes(h + hashlib.sha256(h).digest()[:8], "little")
        out.append(v % F.P)
        i += 1
    return out


_RC = _pseudo_constants((FULL_ROUNDS + PARTIAL_ROUNDS) * T)
# MDS-ish circulant matrix for t=3
_MDS = [[2, 1, 1], [1, 2, 1], [1, 1, 2]]


class _CircuitBuilder:
    """Builds AssertZero-only ACIR + the matching witness assignment."""

    def __init__(self):
        self.opcodes: list = []
        self.values: dict[int, int] = {}
        self.next_witness = 0

    def new_witness(self, value: int) -> acir.Witness:
        w = acir.Witness(self.next_witness)
        self.values[self.next_witness] = value % F.P
        self.next_witness += 1
        return w

    def mul(self, a: acir.Witness, b: acir.Witness) -> acir.Witness:
        out = self.new_witness(self.values[a.index] * self.values[b.index])
        self.opcodes.append(acir.AssertZero(acir.Expression(
            mul_terms=[(1, a, b)],
            linear_combinations=[(F.P - 1, out)])))
        return out

    def linear(self, terms, const: int = 0) -> acir.Witness:
        """New witness = sum coeff*w + const, with one AssertZero."""
        val = const
        for coeff, w in terms:
            val += coeff * self.values[w.index]
        out = self.new_witness(val)
        lc = [(c % F.P, w) for c, w in terms] + [(F.P - 1, out)]
        self.opcodes.append(acir.AssertZero(acir.Expression(
            linear_combinations=lc, q_c=const % F.P)))
        return out


def _sbox(b: _CircuitBuilder, x: acir.Witness) -> acir.Witness:
    x2 = b.mul(x, x)
    x4 = b.mul(x2, x2)
    return b.mul(x4, x)


def _permutation(b: _CircuitBuilder, state: list) -> list:
    rc = iter(_RC)

    def full_round(state):
        state = [b.linear([(1, s)], next(rc)) for s in state]
        state = [_sbox(b, s) for s in state]
        return [b.linear([(m, s) for m, s in zip(row, state)])
                for row in _MDS]

    def partial_round(state):
        s0 = b.linear([(1, state[0])], next(rc))
        # burn the other two constants to keep the schedule uniform
        next(rc), next(rc)
        s0 = _sbox(b, s0)
        state = [s0] + state[1:]
        return [b.linear([(m, s) for m, s in zip(row, state)])
                for row in _MDS]

    for _ in range(FULL_ROUNDS // 2):
        state = full_round(state)
    for _ in range(PARTIAL_ROUNDS):
        state = partial_round(state)
    for _ in range(FULL_ROUNDS // 2):
        state = full_round(state)
    return state


def hash_chain_circuit(n_hashes: int, seed: int = 1):
    """Returns (acir.Program, witness values dict, final hash value).

    Mirrors poseidon-rounds/src/main.nr: start from an input, apply the
    hash (permutation + feed-forward) n times, expose the result.
    """
    b = _CircuitBuilder()
    x = b.new_witness(seed)
    cur = x
    zero_pad = [b.new_witness(0), b.new_witness(1)]
    for w in zero_pad:
        # constrain the pad witnesses to their constants
        b.opcodes.append(acir.AssertZero(acir.Expression(
            linear_combinations=[(1, w)], q_c=F.neg(b.values[w.index]))))
    for _ in range(n_hashes):
        state = _permutation(b, [cur, zero_pad[0], zero_pad[1]])
        cur = state[0]
    out = b.linear([(1, cur)])
    circuit = acir.Circuit(
        opcodes=b.opcodes,
        private_parameters=[x.index],
        return_values=[out.index],
        current_witness_index=b.next_witness)
    program = acir.Program(functions=[circuit])
    return program, dict(b.values), b.values[out.index]
