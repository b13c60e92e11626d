"""Recursive-verification engine tests: BN254 pairing + Groth16 over R1CS.

Covers the capability of the reference's Go/gnark recursive verifier
(``recursive-verifier/app/circuit/common.go:15-177``): Groth16
setup/prove/verify.  The pairing is validated by bilinearity (the standard
oracle when no external implementation is vendored); Groth16 by
end-to-end soundness probes (wrong publics, tampered proof points).
"""

import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.recursion import groth16
from provekit_tpu.recursion.curve import G1, G2, g1_generator, g2_generator
from provekit_tpu.recursion.fq import Fq2, Fq12, Q
from provekit_tpu.recursion.pairing import pairing


def test_generators_on_curve_and_order():
    g1, g2 = g1_generator(), g2_generator()
    assert G1.is_on_curve(g1)
    assert G2.is_on_curve(g2)
    assert G1.mul(g1, F.P) is None          # r * G1 = infinity
    assert G2.mul(g2, F.P) is None          # r * G2 = infinity
    # group law sanity: 2G + G == 3G
    assert G1.add(G1.double(g1), g1) == G1.mul(g1, 3)
    assert G2.add(G2.double(g2), g2) == G2.mul(g2, 3)


def test_fq2_fq12_arithmetic():
    a = Fq2(3, 5)
    assert a * a.inv() == Fq2(1, 0)
    assert (a * a) == a.sqr()
    x = Fq12(range(1, 13))
    assert (x * x.inv()).is_one()
    assert x.pow(Q) == _frob_naive(x)


def _frob_naive(x):
    # x^q via pow is the oracle for the precomputed Frobenius tables
    return x.pow(Q)


def test_msm_matches_naive():
    g1 = g1_generator()
    rng = random.Random(7)
    pts = [G1.mul(g1, rng.randrange(F.P)) for _ in range(5)]
    scalars = [rng.randrange(F.P) for _ in range(5)]
    acc = None
    for p, s in zip(pts, scalars):
        acc = G1.add(acc, G1.mul(p, s))
    assert G1.msm(pts, scalars) == acc


@pytest.mark.slow
def test_pairing_bilinearity():
    g1, g2 = g1_generator(), g2_generator()
    e = pairing(g1, g2)
    assert not e.is_one()
    assert pairing(G1.mul(g1, 5), G2.mul(g2, 7)) == e.pow(35)
    assert pairing(G1.mul(g1, 35), g2) == e.pow(35)
    # e(-P, Q) = e(P, Q)^-1 : product with e(P,Q) is 1
    from provekit_tpu.recursion.pairing import pairing_product_is_one
    assert pairing_product_is_one([(g1, g2), (G1.neg(g1), g2)])


def _tiny_r1cs():
    """x * y = z, x + y = s with x public; z layout [1, x, y, z, s]."""
    from provekit_tpu.r1cs import R1CS
    r = R1CS()
    x, y, z, s = (r.new_witness() for _ in range(4))
    r.add_constraint([(1, x)], [(1, y)], [(1, z)])
    r.add_constraint([(1, x), (1, y)], [(1, 0)], [(1, s)])
    r.num_public_inputs = 1
    return r


def _tiny_witness(xv, yv):
    return [1, xv, yv, xv * yv % F.P, (xv + yv) % F.P]


@pytest.mark.slow
def test_groth16_end_to_end():
    r1cs = _tiny_r1cs()
    z = _tiny_witness(3, 7)
    rng = random.Random(42)
    keys = groth16.setup(r1cs, rng=rng)
    proof = groth16.prove(keys, r1cs, z, rng=rng)
    assert groth16.verify(keys, proof, [3])
    # wrong public input
    assert not groth16.verify(keys, proof, [4])
    # tampered proof point
    bad = groth16.Groth16Proof(a=G1.double(proof.a), b=proof.b, c=proof.c)
    assert not groth16.verify(keys, bad, [3])


@pytest.mark.slow
def test_groth16_on_compiled_circuit():
    from provekit_tpu.acir import model as acir
    from provekit_tpu.compiler import NoirProofScheme

    w = acir.Witness
    c = acir.Circuit(opcodes=[
        acir.AssertZero(acir.Expression(
            mul_terms=[(1, w(0), w(1))],
            linear_combinations=[(F.P - 1, w(2))])),
        acir.AssertZero(acir.Expression(
            linear_combinations=[(1, w(0)), (1, w(1)), (F.P - 1, w(3))])),
    ], private_parameters=[0, 1], return_values=[2, 3])
    scheme = NoirProofScheme.from_program(acir.Program(functions=[c]),
                                          security_level=30, max_pow_bits=6)
    z = scheme.solve_witness({0: 3, 1: 7, 2: 21, 3: 10},
                             rng=random.Random(1))
    rng = random.Random(9)
    keys = groth16.setup(scheme.r1cs, rng=rng)
    proof = groth16.prove(keys, scheme.r1cs, z, rng=rng)
    assert groth16.verify(keys, proof, [])
