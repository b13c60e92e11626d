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
