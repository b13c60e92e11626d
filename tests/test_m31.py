"""M31/CM31 field and NTT tests (differential vs scalar reference)."""

import random

import jax.numpy as jnp
import numpy as np

from provekit_tpu.fields import m31


def arr(xs):
    return jnp.asarray(np.array(xs, dtype=np.uint32))


def test_vmul_vs_reference(rng):
    xs = [rng.randrange(m31.P31) for _ in range(64)]
    ys = [rng.randrange(m31.P31) for _ in range(64)]
    got = list(np.asarray(m31.vmul(arr(xs), arr(ys))))
    assert got == [x * y % m31.P31 for x, y in zip(xs, ys)]
    edge = [0, 1, m31.P31 - 1, 0xFFFF, 0x7FFF8000, 0x12345678]
    got = list(np.asarray(m31.vmul(arr(edge), arr(edge))))
    assert got == [x * x % m31.P31 for x in edge]


def test_vadd_vsub(rng):
    xs = [0, 1, m31.P31 - 1] + [rng.randrange(m31.P31) for _ in range(13)]
    ys = [m31.P31 - 1, m31.P31 - 1, m31.P31 - 1] + [
        rng.randrange(m31.P31) for _ in range(13)]
    assert list(np.asarray(m31.vadd(arr(xs), arr(ys)))) == [
        (x + y) % m31.P31 for x, y in zip(xs, ys)]
    assert list(np.asarray(m31.vsub(arr(xs), arr(ys)))) == [
        (x - y) % m31.P31 for x, y in zip(xs, ys)]


def test_cm31_ntt_matches_dft(rng):
    ln = 4
    n = 1 << ln
    xr = [rng.randrange(m31.P31) for _ in range(n)]
    xi = [rng.randrange(m31.P31) for _ in range(n)]
    er, ei = m31.cm31_ntt(arr(xr), arr(xi))
    w = m31.cm31_root_of_unity(ln)
    for k in [0, 1, 7, 15]:
        acc = (0, 0)
        for j in range(n):
            acc = m31.cm31_add(
                acc, m31.cm31_mul((xr[j], xi[j]), m31.cm31_pow(w, j * k)))
        assert (int(er[k]), int(ei[k])) == acc, k
    br, bi = m31.cm31_intt(er, ei)
    assert list(np.asarray(br)) == xr
    assert list(np.asarray(bi)) == xi
