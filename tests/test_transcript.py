"""Fiat-Shamir transcript tests: replay determinism, tamper detection."""

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fs import DomainSeparator


def make_ds():
    return (DomainSeparator("🌪️").absorb(1, "root").squeeze(2, "chal")
            .hint("paths").absorb(3, "sums").squeeze(1, "alpha"))


def test_roundtrip():
    ds = make_ds()
    p = ds.to_prover_state()
    p.add_scalars([7])
    c = p.challenge_scalars(2)
    p.hint_bytes(b"xyz")
    p.add_scalars([1, 2, 3])
    a = p.challenge_scalars(1)
    proof = p.narg_string()

    v = ds.to_verifier_state(proof)
    assert v.next_scalars(1) == [7]
    assert v.challenge_scalars(2) == c
    assert v.hint_bytes() == b"xyz"
    assert v.next_scalars(3) == [1, 2, 3]
    assert v.challenge_scalars(1) == a
    v.finish()


def test_iv_depends_on_pattern():
    d1 = DomainSeparator("a").absorb(1, "x")
    d2 = DomainSeparator("a").absorb(1, "y")
    assert d1.iv() != d2.iv()


def test_tamper_changes_challenges():
    ds = make_ds()
    p = ds.to_prover_state()
    p.add_scalars([7])
    c = p.challenge_scalars(2)
    p.hint_bytes(b"")
    p.add_scalars([1, 2, 3])
    p.challenge_scalars(1)
    proof = bytearray(p.narg_string())
    proof[0] ^= 1
    v = ds.to_verifier_state(bytes(proof))
    v.next_scalars(1)
    assert v.challenge_scalars(2) != c


def test_op_mismatch_raises():
    ds = make_ds()
    p = ds.to_prover_state()
    with pytest.raises(ValueError):
        p.challenge_scalars(1)
    p2 = ds.to_prover_state()
    with pytest.raises(ValueError):
        p2.add_scalars([1, 2])


def test_hints_not_absorbed():
    ds = DomainSeparator("t").absorb(1, "v").hint("h").squeeze(1, "c")
    p1 = ds.to_prover_state()
    p1.add_scalars([5])
    p1.hint_bytes(b"AAAA")
    c1 = p1.challenge_scalars(1)
    p2 = ds.to_prover_state()
    p2.add_scalars([5])
    p2.hint_bytes(b"BBBB")
    c2 = p2.challenge_scalars(1)
    assert c1 == c2
