"""Unit tests for the logUp lookup layer (recursion/lookup.py).

The e2e recursion tests exercise lookups through full proofs; these pin
the gadget semantics in isolation: S-box table correctness, borrow-chain
integer comparison (boundary + negative), canonical decomposition, and
that tampering with committed lookup wires or multiplicities makes the
system unsatisfiable.
"""

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.hash import skyscraper as S
from provekit_tpu.recursion.builder import CircuitBuilder
from provekit_tpu.recursion.lookup import (Lookups, PLACEHOLDER_BETA,
                                           PLACEHOLDER_THETA, SBOX_TABLE)

P = F.P


def fresh():
    b = CircuitBuilder(debug_assert=True)
    beta = b.public_input(PLACEHOLDER_BETA)
    theta = b.public_input(PLACEHOLDER_THETA)
    lk = Lookups(b)
    b.lookups = lk
    return b, lk, beta, theta


def satisfied(b, z=None):
    r1cs, zb = b.build()
    z = z if z is not None else zb
    return r1cs.is_satisfied(V.pack([F.to_mont(v) for v in z]))


def test_sbox_table_matches_reference():
    assert SBOX_TABLE == [S.sbox(v) for v in range(256)]
    assert sorted(set(SBOX_TABLE)) == list(range(256))  # bijection


def test_limbs_le_constant_boundary():
    b, lk, beta, theta = fresh()
    c = P - 1
    limbs = [lk.limb16((c >> (16 * i)) & 0xFFFF) for i in range(16)]
    lk.assert_limbs_le_constant(limbs, c)  # equality is <=
    lk.finalize(beta, theta)
    assert satisfied(b)


def test_limbs_le_constant_rejects_exceeding_value():
    b, lk, beta, theta = fresh()
    with pytest.raises(AssertionError):
        limbs = [lk.limb16(0xFFFF) for _ in range(16)]
        lk.assert_limbs_le_constant(limbs, P - 1)  # 2^256-1 > p-1


def test_canonical_limbs_roundtrip_and_bits():
    b, lk, beta, theta = fresh()
    x = b.alloc(0x1234_5678_9ABC_DEF0)
    limbs, bits = lk.canonical_limbs(x, low_bits=20)
    assert len(bits) >= 20
    got = sum(b.value(bit) << i for i, bit in enumerate(bits[:20]))
    assert got == 0x1234_5678_9ABC_DEF0 & ((1 << 20) - 1)
    lk.finalize(beta, theta)
    assert satisfied(b)


def test_tampered_multiplicity_unsatisfiable():
    b, lk, beta, theta = fresh()
    x = b.alloc(123456789)
    from provekit_tpu.recursion.gadgets import bar
    out = bar(b, x)
    assert b.value(out) == S.bar(123456789)
    lk.finalize(beta, theta)
    r1cs, z = b.build()
    assert r1cs.is_satisfied(V.pack([F.to_mont(v) for v in z]))
    # flip one committed wire (a byte / multiplicity): logUp must break
    for probe in (lk.committed[0], lk.committed[-1]):
        zt = list(z)
        zt[probe] = (zt[probe] + 1) % P
        assert not r1cs.is_satisfied(V.pack([F.to_mont(v) for v in zt]))


def test_uint_limbs_pins_width():
    b, lk, beta, theta = fresh()
    nonce = b.alloc((1 << 64) - 1)
    lk.uint_limbs(nonce, 64)
    lk.finalize(beta, theta)
    assert satisfied(b)
    b2, lk2, beta2, theta2 = fresh()
    big = b2.alloc(1 << 64)
    with pytest.raises(AssertionError):
        lk2.uint_limbs(big, 64)
