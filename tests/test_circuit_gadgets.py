"""Differential tests: in-circuit gadgets vs host reference implementations.

Mirrors the reference's optimized-vs-reference differential pattern
(skyscraper/core/src/simple.rs:16-27 etc.), applied to constraint gadgets:
every gadget must (a) produce the host value and (b) emit a satisfied R1CS.
"""

import random

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.hash import skyscraper as S
from provekit_tpu.recursion import builder as cb
from provekit_tpu.recursion import gadgets as G

rng = random.Random(0xC1BC)


def _check(b: cb.CircuitBuilder):
    r1cs, z = b.build()
    from provekit_tpu.fields import vector as V
    zm = V.pack([F.to_mont(v) for v in z])
    assert r1cs.is_satisfied(zm)
    return r1cs


def test_lc_algebra():
    b = cb.CircuitBuilder()
    x = b.alloc(5)
    y = b.alloc(7)
    lc = x.scale(3) + y - 2
    assert b.value(lc) == 20
    z = b.mul(lc, y)
    assert b.value(z) == 140
    b.assert_eq(z, b.constant(140))
    _check(b)


def test_to_bits_roundtrip():
    b = cb.CircuitBuilder()
    v = rng.randrange(F.P)
    x = b.alloc(v)
    bits = b.to_bits(x, 254, assert_canonical=True)
    assert b.value(b.from_bits(bits)) == v
    _check(b)


def test_bits_le_constant_rejects():
    # witness > constant must yield an unsatisfied system
    b = cb.CircuitBuilder()
    x = b.alloc(100)
    bits = b.to_bits(x, 8)
    b.assert_bits_le_constant(bits, 99)
    r1cs, z = b.build()
    from provekit_tpu.fields import vector as V
    zm = V.pack([F.to_mont(v) for v in z])
    assert not r1cs.is_satisfied(zm)


def test_sbox_matches_host():
    b = cb.CircuitBuilder()
    for _ in range(8):
        v = rng.randrange(256)
        bits = [b.alloc((v >> i) & 1) for i in range(8)]
        out = G.sbox_bits(b, bits)
        got = sum(b.value(bit) << i for i, bit in enumerate(out))
        assert got == S.sbox(v)
    _check(b)


def test_bar_matches_host():
    b = cb.CircuitBuilder()
    for v in [0, 1, F.P - 1, rng.randrange(F.P), rng.randrange(F.P)]:
        x = b.alloc(v)
        out = G.bar(b, x)
        assert b.value(out) == S.bar(v)
    _check(b)


def test_permute_compress_match_host():
    b = cb.CircuitBuilder()
    l, r = rng.randrange(F.P), rng.randrange(F.P)
    lo, ro = G.permute(b, b.alloc(l), b.alloc(r))
    wl, wr = S.permute(l, r)
    assert b.value(lo) == wl and b.value(ro) == wr
    c = G.compress(b, b.alloc(l), b.alloc(r))
    assert b.value(c) == S.compress(l, r)
    _check(b)


def test_sponge_matches_host():
    from provekit_tpu.fs.sponge import SkyscraperSponge
    iv = bytes(range(32))
    host = SkyscraperSponge(iv)
    b = cb.CircuitBuilder()
    g = G.SpongeGadget(b, iv)

    seq = [("absorb", [rng.randrange(F.P)]),
           ("squeeze", 2),
           ("absorb", [rng.randrange(F.P), rng.randrange(F.P)]),
           ("squeeze", 1),
           ("squeeze", 3)]
    for kind, arg in seq:
        if kind == "absorb":
            host.absorb(arg)
            g.absorb([b.alloc(v) for v in arg])
        else:
            want = host.squeeze(arg)
            got = [b.value(x) for x in g.squeeze(arg)]
            assert got == want
    _check(b)


def test_split_transcript_roundtrip():
    from provekit_tpu.fs import DomainSeparator
    ds = DomainSeparator("t")
    ds.absorb(2, "a").squeeze(1, "c").hint("h").absorb(1, "b")
    tr = ds.to_prover_state()
    vals = [rng.randrange(F.P) for _ in range(3)]
    tr.add_scalars(vals[:2])
    tr.challenge_scalars(1)
    tr.hint_bytes(b"payload")
    tr.add_scalars(vals[2:])
    proof = tr.narg_string()
    scalars, hints = G.split_transcript(ds, proof)
    assert scalars == vals
    assert hints == [b"payload"]
