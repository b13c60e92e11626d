"""Differential tests: vectorized TPU field ops vs Python-int reference.

Mirrors the reference's proptest strategy (optimized impl vs reference impl,
``skyscraper/block-multiplier/src/scalar.rs`` tests).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V

N = 64


def rand_elems(rng, n=N):
    return [rng.randrange(F.P) for _ in range(n)]


def test_pack_roundtrip(rng):
    xs = rand_elems(rng) + [0, 1, F.P - 1]
    assert V.unpack(V.pack(xs)) == xs


def test_add_sub_neg(rng):
    xs, ys = rand_elems(rng), rand_elems(rng)
    a, b = V.pack(xs), V.pack(ys)
    assert V.unpack(V.add_mod(a, b)) == [F.add(x, y) for x, y in zip(xs, ys)]
    assert V.unpack(V.sub_mod(a, b)) == [F.sub(x, y) for x, y in zip(xs, ys)]
    assert V.unpack(V.neg_mod(a)) == [F.neg(x) for x in xs]


def test_add_edge_cases():
    xs = [0, 1, F.P - 1, F.P - 1, (F.P - 1) // 2]
    ys = [0, F.P - 1, F.P - 1, 1, (F.P + 1) // 2]
    a, b = V.pack(xs), V.pack(ys)
    assert V.unpack(V.add_mod(a, b)) == [F.add(x, y) for x, y in zip(xs, ys)]


def test_mont_mul(rng):
    xs, ys = rand_elems(rng), rand_elems(rng)
    # feed Montgomery-form inputs, expect Montgomery-form product
    a = V.pack([F.to_mont(x) for x in xs])
    b = V.pack([F.to_mont(y) for y in ys])
    got = V.unpack(V.mont_mul(a, b))
    assert got == [F.to_mont(F.mul(x, y)) for x, y in zip(xs, ys)]


def test_mont_roundtrip(rng):
    xs = rand_elems(rng)
    a = V.pack(xs)
    am = V.to_mont(a)
    assert V.unpack(am) == [F.to_mont(x) for x in xs]
    assert V.unpack(V.from_mont(am)) == xs


def test_mul_std(rng):
    xs, ys = rand_elems(rng), rand_elems(rng)
    got = V.unpack(V.mul_std(V.pack(xs), V.pack(ys)))
    assert got == [F.mul(x, y) for x, y in zip(xs, ys)]


def test_reduce_256(rng):
    xs = [rng.randrange(1 << 256) for _ in range(N)] + [0, F.P, 2 * F.P, (1 << 256) - 1]
    arr = np.zeros((F.NLIMBS, len(xs)), dtype=np.uint32)
    for i, v in enumerate(xs):
        arr[:, i] = [(v >> (16 * k)) & 0xFFFF for k in range(F.NLIMBS)]
    got = V.unpack(V.reduce_256(jnp.asarray(arr)))
    assert got == [x % F.P for x in xs]


def test_mont_pow(rng):
    xs = rand_elems(rng, N)
    a = V.pack([F.to_mont(x) for x in xs])
    for e in [0, 1, 2, 3, 65537, F.P - 2]:
        got = V.unpack(V.mont_pow(a, e))
        assert got == [F.to_mont(pow(x, e, F.P)) for x in xs], e


def test_batch_inv(rng):
    xs = rand_elems(rng, N)
    xs[3] = 0
    xs[17] = 0
    a = V.pack([F.to_mont(x) for x in xs])
    got = V.unpack(V.batch_inv_mont(a))
    want = [F.to_mont(F.inv(x)) if x != 0 else 0 for x in xs]
    assert got == want


def test_sum_dot(rng):
    xs, ys = rand_elems(rng, N), rand_elems(rng, N)
    a = V.pack([F.to_mont(x) for x in xs])
    b = V.pack([F.to_mont(y) for y in ys])
    s = V.unpack_scalar(V.sum_mod(a))
    assert s == F.to_mont(sum(xs) % F.P)
    d = V.unpack_scalar(V.dot_mont(a, b))
    # mont_mul(aR, bR) = abR; sum preserves form
    assert d == F.to_mont(sum(x * y for x, y in zip(xs, ys)) % F.P)


def test_masks(rng):
    xs = [0, 5, 0, F.P - 1]
    a = V.pack(xs)
    assert list(np.asarray(V.is_zero_mask(a))) == [True, False, True, False]
    b = V.pack([0, 5, 1, 2])
    assert list(np.asarray(V.eq_mask(a, b))) == [True, True, False, False]


def test_segment_sum_oversized_segments(rng):
    """Segments beyond 2^16 terms must not overflow the u32 limb planes.

    Regression: LogUp balance rows sum one inverse per looked-up witness —
    hundreds of thousands of terms in one row for 256-bit ECDSA circuits —
    and the constant-one column appears in most constraints on the
    transpose side.  (fields/wide.py split_oversized_segments)
    """
    from provekit_tpu.fields.wide import (segment_sum_mod_split,
                                          split_oversized_segments)
    big = 70_000  # > 2^16
    vals = [rng.randrange(F.P) for _ in range(64)]
    ids = np.concatenate([np.zeros(big, dtype=np.int32),
                          np.arange(len(vals), dtype=np.int32)])
    x = rng.randrange(F.P)
    prods = V.pack([F.to_mont(x)] * big + [F.to_mont(v) for v in vals])
    new_ids, extra = split_oversized_segments(ids, len(vals))
    assert extra is not None and extra.size > 0
    out = segment_sum_mod_split(prods, jnp.asarray(new_ids),
                                jnp.asarray(extra), len(vals))
    got = [F.from_mont(c) for c in V.unpack(out)]
    assert got[0] == (big * x + vals[0]) % F.P
    assert got[1:] == [v % F.P for v in vals[1:]]


def test_from_mont_chunked_matches(rng):
    vals = [rng.randrange(F.P) for _ in range(1000)]
    a = V.pack([F.to_mont(v) for v in vals])
    got = V.from_mont_chunked(a, max_elems=64)
    want = V.from_mont(a)
    assert bool(jnp.all(V.eq_mask(got, want)))
    # shape with extra batch dims
    b = a[:, :990].reshape(16, 10, 99)
    got2 = V.from_mont_chunked(b, max_elems=128)
    assert got2.shape == b.shape
    assert bool(jnp.all(V.eq_mask(got2.reshape(16, 990),
                                  want[:, :990])))
