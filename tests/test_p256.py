"""P-256 circuit family: non-native arithmetic, curve gadgets, ECDSA.

Counterpart of noir-examples/p256_std (BASELINE config "non-native field
arithmetic, big MSM-like matvecs"): satisfaction-level tests of the bignum
mul/linear gadgets, point add/double, a small scalar-mul ladder, and the
full ECDSA equation with shortened scalars; the 256-bit ladder is the
p256 bench workload (bench.py BENCH_CIRCUIT=p256).
"""

import random

import pytest

from provekit_tpu.acir import model as acir
from provekit_tpu.circuits import p256
from provekit_tpu.compiler import NoirProofScheme
from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V


def check_satisfied(program, acir_values):
    scheme = NoirProofScheme.from_program(program, security_level=30,
                                          max_pow_bits=6)
    witness = scheme.solve_witness(acir_values, rng=random.Random(5))
    z = V.to_mont(V.pack(witness))
    assert scheme.r1cs.check_z0(z)
    assert scheme.r1cs.is_satisfied(z), "R1CS not satisfied"
    return scheme, witness


def wrap(b):
    c = acir.Circuit(opcodes=b.opcodes, private_parameters=[],
                     return_values=[],
                     current_witness_index=b.next_witness)
    return acir.Program(functions=[c])


def test_host_curve_math():
    G = (p256.P256_GX, p256.P256_GY)
    # group law sanity: (2+3)G == 5G, order * G == infinity
    assert p256.ec_add(p256.ec_mul(2, G), p256.ec_mul(3, G)) == \
        p256.ec_mul(5, G)
    assert p256.ec_mul(p256.P256_N, G) is None
    # K point is on the curve and not tiny-multiple-related to G
    x, y = p256.K_POINT
    assert (y * y - (x ** 3 + p256.P256_A * x + p256.P256_B)) % p256.P256_P == 0


def test_nn_mul_gadget():
    rng = random.Random(1)
    b = p256.Builder()
    fp = p256.NNContext(b, p256.P256_P)
    a_v = rng.randrange(p256.P256_P)
    b_v = rng.randrange(p256.P256_P)
    a = fp.witness(a_v)
    bb = fp.witness(b_v)
    r = fp.mul(a, bb)
    assert fp.value(r) == a_v * b_v % p256.P256_P
    lin = fp.linear([(2, a), (-1, bb)], 7)
    assert fp.value(lin) == (2 * a_v - b_v + 7) % p256.P256_P
    scheme, witness = check_satisfied(wrap(b), dict(b.values))

    # negative: corrupt the product result limb -> unsatisfied
    bad = dict(b.values)
    bad[r.limbs[0].index] = (bad[r.limbs[0].index] + 1) % F.P
    w2 = scheme.solve_witness(bad, rng=random.Random(6))
    z2 = V.to_mont(V.pack(w2))
    assert not scheme.r1cs.is_satisfied(z2)


def test_nn_canonicalize_and_eq_mod():
    b = p256.Builder()
    fp = p256.NNContext(b, p256.P256_P)
    fn = p256.NNContext(b, p256.P256_N)
    # a value between n and p: canonical mod p, reduces mod n by one n
    v = p256.P256_N + 12345
    a = fp.witness(v)
    ac = fp.canonicalize(a)
    assert fp.value(ac) == v
    r = fn.witness(v - p256.P256_N)
    rc = fn.canonicalize(r)
    fp.assert_canonical_eq_mod(ac, rc, p256.P256_N)
    check_satisfied(wrap(b), dict(b.values))


def test_point_add_double():
    b = p256.Builder()
    fp = p256.NNContext(b, p256.P256_P)
    curve = p256.CurveGadget(fp)
    G = (p256.P256_GX, p256.P256_GY)
    g = curve.constant_point(G)
    g2 = curve.double(g)
    g3 = curve.add(g2, g)
    assert curve.point_value(g2) == p256.ec_mul(2, G)
    assert curve.point_value(g3) == p256.ec_mul(3, G)
    curve.assert_on_curve(g3)
    check_satisfied(wrap(b), dict(b.values))


def test_scalar_mul_small():
    program, vals, expected = p256.scalar_mul_circuit(k=11, nbits=5)
    scheme, _ = check_satisfied(program, vals)
    assert expected == p256.ec_mul(11, (p256.P256_GX, p256.P256_GY))
    # the ladder is ~5 doubles + adds of ~full gadget cost
    assert scheme.r1cs.num_constraints > 1000


def test_ecdsa_verify_shortened():
    # 6-bit scalars: full equation (s inverse, u1/u2, Shamir ladder, R.x ≡ r)
    pub, r, s, h = p256.ecdsa_test_vector(seed=2, nbits=6)
    program, vals = p256.ecdsa_verify_circuit(pub, r, s, h, nbits=6)
    check_satisfied(program, vals)


def test_ecdsa_rejects_bad_signature():
    pub, r, s, h = p256.ecdsa_test_vector(seed=3, nbits=6)
    with pytest.raises(AssertionError):
        p256.ecdsa_verify_circuit(pub, r, (s + 1) % p256.P256_N, h, nbits=6)


@pytest.mark.slow
def test_ecdsa_verify_full_compiles():
    # real 256-bit signature: builds + solves + satisfies (~600k constraints)
    pub, r, s, h = p256.ecdsa_test_vector(seed=1, nbits=256)
    program, vals = p256.ecdsa_verify_circuit(pub, r, s, h, nbits=256)
    check_satisfied(program, vals)
