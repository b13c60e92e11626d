"""M31 / CM31 arithmetic and NTT — the planned int32-native TPU field.

The reference plans a Mersenne-31 migration (``ROADMAP.md:14,47-50``) and
prototypes CM31 radix-8 NTTs in ``playground/cm31_ntt`` (rm31.rs redundant
arithmetic, cm31.rs complex extension, ntt.rs radix-8 variants).  On TPU,
M31 is the natural field: products of 31-bit values split into two uint32
halves with a single fold step, no limb planes needed — an order of
magnitude cheaper than BN254 limb arithmetic.

* M31: p = 2^31 - 1.  Elements are uint32 lanes in [0, p).
* CM31: p^2 complex extension (a + ib); its multiplicative group has
  2-adicity 32, enabling power-of-two NTTs (M31* itself has 2-adicity 1).

Scalar (Python int) reference + vectorized jnp, differentially tested.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

P31 = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Scalar reference


def m31_mul(a: int, b: int) -> int:
    return a * b % P31


def m31_add(a: int, b: int) -> int:
    return (a + b) % P31


def cm31_mul(a: tuple, b: tuple) -> tuple:
    (ar, ai), (br, bi) = a, b
    return ((ar * br - ai * bi) % P31, (ar * bi + ai * br) % P31)


def cm31_add(a: tuple, b: tuple) -> tuple:
    return ((a[0] + b[0]) % P31, (a[1] + b[1]) % P31)


def cm31_pow(a: tuple, e: int) -> tuple:
    acc = (1, 0)
    base = a
    while e:
        if e & 1:
            acc = cm31_mul(acc, base)
        base = cm31_mul(base, base)
        e >>= 1
    return acc


def cm31_inv(a: tuple) -> tuple:
    # norm = a * conj(a) = ar^2 + ai^2 in M31
    norm = (a[0] * a[0] + a[1] * a[1]) % P31
    ninv = pow(norm, P31 - 2, P31)
    return (a[0] * ninv % P31, (P31 - a[1]) * ninv % P31)


# |CM31*| = p^2 - 1 = 2^32 * 3 * 7^2 * 11 * 31 * 151 * 331
CM31_GROUP_ORDER = P31 * P31 - 1
CM31_TWO_ADICITY = 32
# A generator of CM31* (verified at import against the group factorization).
CM31_GENERATOR = (7, 2)
_ODD_FACTORS = [3, 7, 11, 31, 151, 331]


def cm31_root_of_unity(log_n: int) -> tuple:
    assert log_n <= CM31_TWO_ADICITY
    return cm31_pow(CM31_GENERATOR, CM31_GROUP_ORDER >> log_n)


def _selfcheck():
    assert CM31_GROUP_ORDER % (1 << 32) == 0
    n = CM31_GROUP_ORDER >> 32
    for q in _ODD_FACTORS:
        while n % q == 0:
            n //= q
    assert n == 1, n
    for q in [2] + _ODD_FACTORS:
        assert cm31_pow(CM31_GENERATOR, CM31_GROUP_ORDER // q) != (1, 0), q
    w = cm31_root_of_unity(4)
    assert cm31_pow(w, 16) == (1, 0) and cm31_pow(w, 8) != (1, 0)


_selfcheck()


# ---------------------------------------------------------------------------
# Vectorized (uint32 lanes)


@jax.jit
def vadd(a, b):
    s = a + b  # < 2p < 2^32
    return jnp.where(s >= P31, s - P31, s)


@jax.jit
def vsub(a, b):
    d = a - b
    return jnp.where(d >> 31 != 0, d + P31, d)  # wrapped => add p


@jax.jit
def vmul(a, b):
    """M31 product via 16-bit splits (uint32 lanes, no 64-bit needed).

    a*b = ah*bh*2^32 + (ah*bl + al*bh)*2^16 + al*bl, with 2^32 = 2 and
    2^16-fold of the mid terms; all partials < 2^32.
    """
    al, ah = a & 0xFFFF, a >> 16       # ah < 2^15
    bl, bh = b & 0xFFFF, b >> 16
    ll = al * bl                       # < 2^32
    m1 = al * bh                       # < 2^31
    m2 = ah * bl                       # < 2^31
    hh = ah * bh                       # < 2^30

    def fold(x):  # x = hi*2^31 + lo -> hi + lo (mod p), result <= 2^31
        return (x & P31) + (x >> 31)

    # m*2^16 mod p for m < 2^31: m = mh*2^15 + ml => mh + ml*2^16, < 2^31
    def times_2_16(m):
        return (m >> 15) + ((m & 0x7FFF) << 16)

    # a*b = hh*2^32 + (m1+m2)*2^16 + ll, with 2^31 = 1 so 2^32 = 2.
    # Interleave folds so every partial stays below 2^32.
    acc = fold(ll) + 2 * hh            # <= 2^31 + 2^31 - 2^17 + 2 < 2^32
    acc = fold(acc) + times_2_16(m1)   # < 2^32
    acc = fold(acc) + times_2_16(m2)   # < 2^32
    acc = fold(acc)                    # <= 2^31 = p + 1
    return jnp.where(acc >= P31, acc - P31, acc)


@jax.jit
def cvmul(ar, ai, br, bi):
    """CM31 product on uint32 lane pairs."""
    rr = vsub(vmul(ar, br), vmul(ai, bi))
    ii = vadd(vmul(ar, bi), vmul(ai, br))
    return rr, ii


@jax.jit
def cvadd(ar, ai, br, bi):
    return vadd(ar, br), vadd(ai, bi)


@jax.jit
def cvsub(ar, ai, br, bi):
    return vsub(ar, br), vsub(ai, bi)


# ---------------------------------------------------------------------------
# CM31 NTT (radix-2 iterative; the TPU counterpart of cm31_ntt's radix-8)


@functools.cache
def _cm31_stage_twiddles(log_n: int, inverse: bool):
    tables = []
    for s in range(1, log_n + 1):
        w = cm31_root_of_unity(s)
        if inverse:
            w = cm31_inv(w)
        half = 1 << (s - 1)
        tw = [(1, 0)] * half
        for k in range(1, half):
            tw[k] = cm31_mul(tw[k - 1], w)
        tr = np.array([t[0] for t in tw], dtype=np.uint32)
        ti = np.array([t[1] for t in tw], dtype=np.uint32)
        tables.append((jnp.asarray(tr), jnp.asarray(ti)))
    return tuple(tables)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _cm31_ntt_core(xr, xi, log_n: int, inverse: bool):
    n = 1 << log_n
    from ..ops.ntt import _bitrev_perm
    rev = jnp.asarray(_bitrev_perm(log_n))
    xr, xi = xr[rev], xi[rev]
    twiddles = _cm31_stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        blocks = n >> s
        xr_ = xr.reshape(blocks, 2, half)
        xi_ = xi.reshape(blocks, 2, half)
        lo_r, lo_i = xr_[:, 0, :], xi_[:, 0, :]
        hi_r, hi_i = xr_[:, 1, :], xi_[:, 1, :]
        twr, twi = twiddles[s - 1]
        tr, ti = cvmul(hi_r, hi_i, twr[None, :], twi[None, :])
        ar, ai = cvadd(lo_r, lo_i, tr, ti)
        br, bi = cvsub(lo_r, lo_i, tr, ti)
        xr = jnp.stack([ar, br], axis=1).reshape(n)
        xi = jnp.stack([ai, bi], axis=1).reshape(n)
    if inverse:
        n_inv = pow(n, P31 - 2, P31)
        xr = vmul(xr, jnp.full_like(xr, n_inv))
        xi = vmul(xi, jnp.full_like(xi, n_inv))
    return xr, xi


def cm31_ntt(xr, xi):
    n = xr.shape[0]
    return _cm31_ntt_core(xr, xi, n.bit_length() - 1, False)


def cm31_intt(xr, xi):
    n = xr.shape[0]
    return _cm31_ntt_core(xr, xi, n.bit_length() - 1, True)
