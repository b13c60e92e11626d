"""Passport composed-circuit tests (complete_age_check counterpart).

The fast test runs the hash + date + ROM-membership composition; the
signature leg (full 256-bit ECDSA over the in-circuit SOD digest) runs
behind ``-m slow`` like the other minute-scale workloads.
"""

import hashlib
import random

import pytest

from provekit_tpu.circuits import passport
from provekit_tpu.compiler import NoirProofScheme
from provekit_tpu.fields import vector as V


def check_satisfied(program, acir_values):
    scheme = NoirProofScheme.from_program(program, security_level=30,
                                          max_pow_bits=6)
    witness = scheme.solve_witness(acir_values, rng=random.Random(7))
    z = V.to_mont(V.pack(witness))
    assert scheme.r1cs.check_z0(z)
    assert scheme.r1cs.is_satisfied(z), "R1CS not satisfied"
    return scheme


def test_passport_composition_no_signature():
    dg1, sod, off, date, age, _ = passport.passport_test_vector(
        seed=2, with_signature=False)
    prog, vals = passport.passport_circuit(dg1, sod, off, date, age)
    check_satisfied(prog, vals)


def test_passport_rejects_wrong_digest_placement():
    dg1, sod, off, date, age, _ = passport.passport_test_vector(
        seed=3, with_signature=False)
    with pytest.raises(AssertionError):
        passport.passport_circuit(dg1, sod, off + 1, date, age)


def test_passport_rejects_underage():
    dg1, sod, off, date, age, _ = passport.passport_test_vector(
        seed=4, with_signature=False)
    # born 1990 -> age 36 at 2026; min_age 40 must fail at witness build
    with pytest.raises(AssertionError):
        passport.passport_circuit(dg1, sod, off, date, min_age=40)


def test_passport_rejects_expired():
    dg1, sod, off, _, age, _ = passport.passport_test_vector(
        seed=5, with_signature=False)
    with pytest.raises(AssertionError):
        passport.passport_circuit(dg1, sod, off, "20310101", age)


def test_century_window_bit():
    # birth_yy 90 > cur_yy 26 -> 19xx; birth_yy 10 <= 26 -> 20xx
    from provekit_tpu.circuits.p256 import Builder
    b = Builder()
    for a_v, b_v, expect in [(90, 26, 1), (10, 26, 0), (26, 26, 0)]:
        aw, bw = b.new_witness(a_v), b.new_witness(b_v)
        t = passport.gt_bit(b, aw, bw, 7)
        assert b.val(t) == expect


@pytest.mark.slow
def test_passport_full_with_ecdsa_signature():
    dg1, sod, off, date, age, sig = passport.passport_test_vector(seed=1)
    assert sig is not None
    prog, vals = passport.passport_circuit(dg1, sod, off, date, age,
                                           signature=sig)
    scheme = check_satisfied(prog, vals)
    assert scheme.r1cs.num_constraints > 500_000


@pytest.mark.slow
def test_passport_signature_rejects_forgery():
    dg1, sod, off, date, age, sig = passport.passport_test_vector(seed=6)
    pub, r, s = sig
    with pytest.raises(AssertionError):
        passport.passport_circuit(dg1, sod, off, date, age,
                                  signature=(pub, r, (s + 1)))
