"""Poseidon2 benchmark circuit: official Grain constants + R1CS soundness."""

import random

from provekit_tpu.circuits import poseidon
from provekit_tpu.circuits.poseidon import _Grain
from provekit_tpu.compiler import NoirProofScheme
from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V


def test_grain_lfsr_matches_published_kat():
    """The Grain generator reproduces the published Poseidon BN254 t=3
    (R_F=8, R_P=57) first round constant (circomlib C[0])."""
    g = _Grain(field=1, sbox=0, n=254, t=3, r_f=8, r_p=57)
    assert g.field_element() == int(
        "0ee9a592ba9a9518d05986d656f40c2114c4993c11bb29938d21d47304cd8e6e",
        16)


def test_constants_are_grain_derived_and_stable():
    rcs = poseidon._RC
    assert len(rcs) == poseidon.FULL_ROUNDS + poseidon.PARTIAL_ROUNDS
    half = poseidon.FULL_ROUNDS // 2
    assert all(len(r) == poseidon.T for r in rcs[:half])
    assert all(len(r) == 1
               for r in rcs[half:half + poseidon.PARTIAL_ROUNDS])
    # first constant of the t=3 R_P=56 stream, pinned for reproducibility
    g = _Grain(field=1, sbox=0, n=254, t=poseidon.T,
               r_f=poseidon.FULL_ROUNDS, r_p=poseidon.PARTIAL_ROUNDS)
    assert rcs[0][0] == g.field_element()


def test_chain_circuit_satisfies():
    program, values, out = poseidon.hash_chain_circuit(2, seed=7)
    scheme = NoirProofScheme.from_program(program, security_level=30,
                                          max_pow_bits=6)
    witness = scheme.solve_witness(values, rng=random.Random(5))
    z = V.pack([F.to_mont(v) for v in witness])
    assert scheme.r1cs.is_satisfied(z)
    # tampered output must fail
    bad = dict(values)
    bad[max(values)] = (out + 1) % F.P
    witness = scheme.solve_witness(bad, rng=random.Random(5))
    z = V.pack([F.to_mont(v) for v in witness])
    assert not scheme.r1cs.is_satisfied(z)
