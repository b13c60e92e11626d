"""NTT over BN254-Fr and the multilinear wavelet transform.

The Reed-Solomon encoder for WHIR commitments (reference: external ``whir``
crate; the in-repo prototype is ``playground/cm31_ntt``).  TPU design:
iterative radix-2 decimation-in-time with a bit-reversal gather up front and
one batched Montgomery multiply per stage — every stage is a full-array
lane-parallel pass, sizes and twiddle tables static per plan.  Multi-chip
scaling shards the leading axis and exchanges stages via collectives
(see ``parallel``).

The wavelet (Mobius) transform converts multilinear evaluations on the
hypercube to multilinear coefficients and back; WHIR's univariate embedding
then treats the coefficient vector as univariate coefficients
(variable k of m corresponds to Y^(2^(m-1-k)) — MSB-first indexing).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V


@functools.cache
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.cache
def _stage_twiddles(log_n: int, inverse: bool = False) -> tuple:
    """Twiddle tables per stage: stage s uses w_s^k, k<2^(s-1), w_s of order 2^s."""
    tables = []
    for s in range(1, log_n + 1):
        w = F.root_of_unity(s)
        if inverse:
            w = F.inv(w)
        half = 1 << (s - 1)
        tw = [1] * half
        for k in range(1, half):
            tw[k] = tw[k - 1] * w % F.P
        tables.append(V.pack([F.to_mont(t) for t in tw]))
    return tuple(tables)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt_core(x: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    """In-order forward/inverse NTT of (16, n) Montgomery values."""
    n = 1 << log_n
    rev = jnp.asarray(_bitrev_perm(log_n))
    x = x[:, rev]
    twiddles = _stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        blocks = n >> s
        xs = x.reshape(16, blocks, 2, half)
        lo, hi = xs[:, :, 0, :], xs[:, :, 1, :]
        tw = twiddles[s - 1][:, None, :]  # (16,1,half)
        t = V.mont_mul(hi, jnp.broadcast_to(tw, hi.shape))
        x = jnp.concatenate(
            [V.add_mod(lo, t)[:, :, None, :], V.sub_mod(lo, t)[:, :, None, :]],
            axis=2).reshape(16, n)
    if inverse:
        n_inv = V.broadcast_scalar(
            V.pack_scalar(F.to_mont(F.inv(n))), x.shape[1:])
        x = V.mont_mul(x, n_inv)
    return x


HOST_TAIL = int(os.environ.get("PROVEKIT_TPU_HOST_TAIL", "2048"))


def _host_ntt(vals: list[int], log_n: int, inverse: bool) -> list[int]:
    """Radix-2 host NTT on canonical ints (tail sizes)."""
    n = 1 << log_n
    rev = _bitrev_perm(log_n)
    x = [vals[rev[i]] for i in range(n)]
    for s in range(1, log_n + 1):
        w = F.root_of_unity(s)
        if inverse:
            w = F.inv(w)
        half = 1 << (s - 1)
        for blk in range(0, n, 1 << s):
            tw = 1
            for j in range(half):
                lo = x[blk + j]
                hi = x[blk + j + half] * tw % F.P
                x[blk + j] = (lo + hi) % F.P
                x[blk + j + half] = (lo - hi) % F.P
                tw = tw * w % F.P
    if inverse:
        ninv = F.inv(n)
        x = [v * ninv % F.P for v in x]
    return x


def _host(arr) -> list[int]:
    return [F.from_mont(v) for v in V.unpack(arr)]


def _dev(vals: list[int]) -> jax.Array:
    return V.pack([F.to_mont(v) for v in vals])


def ntt(x: jax.Array) -> jax.Array:
    """Forward NTT: coefficients -> evaluations at [w^0, w^1, ..., w^(n-1)]."""
    n = x.shape[1]
    if n <= HOST_TAIL and not isinstance(x, jax.core.Tracer):
        return _dev(_host_ntt(_host(x), n.bit_length() - 1, False))
    return _ntt_core(x, n.bit_length() - 1, False)


def intt(x: jax.Array) -> jax.Array:
    """Inverse NTT: evaluations -> coefficients."""
    n = x.shape[1]
    if n <= HOST_TAIL and not isinstance(x, jax.core.Tracer):
        return _dev(_host_ntt(_host(x), n.bit_length() - 1, True))
    return _ntt_core(x, n.bit_length() - 1, True)


def rs_encode(coeffs: jax.Array, log_domain: int) -> jax.Array:
    """Reed-Solomon encode: zero-pad coefficients to 2^log_domain, NTT."""
    n = coeffs.shape[1]
    domain = 1 << log_domain
    assert domain >= n
    if domain <= HOST_TAIL and not isinstance(coeffs, jax.core.Tracer):
        vals = _host(coeffs) + [0] * (domain - n)
        return _dev(_host_ntt(vals, log_domain, False))
    padded = jnp.pad(coeffs, [(0, 0), (0, domain - n)])
    return _ntt_core(padded, log_domain, False)


def wavelet(evals: jax.Array, inverse: bool = False) -> jax.Array:
    """Multilinear evals <-> coeffs (Mobius transform), MSB-first variables.

    Forward (evals->coeffs): for each variable, hi -= lo.
    Inverse (coeffs->evals): hi += lo.
    """
    n = evals.shape[1]
    if n <= HOST_TAIL and not isinstance(evals, jax.core.Tracer):
        x = _host(evals)
        log_n = n.bit_length() - 1
        for s in range(log_n):
            half = 1 << s
            step = half << 1
            for blk in range(0, n, step):
                for j in range(half):
                    lo = x[blk + j]
                    hi = x[blk + j + half]
                    x[blk + j + half] = ((hi + lo) if inverse else (hi - lo)) % F.P
        return _dev(x)
    return _wavelet_dev(evals, inverse)


@functools.partial(jax.jit, static_argnums=(1,))
def _wavelet_dev(evals: jax.Array, inverse: bool = False) -> jax.Array:
    n = evals.shape[1]
    log_n = n.bit_length() - 1
    x = evals
    for s in range(log_n):
        half = 1 << s
        blocks = n >> (s + 1)
        xs = x.reshape(16, blocks, 2, half)
        lo, hi = xs[:, :, 0, :], xs[:, :, 1, :]
        hi = V.add_mod(hi, lo) if inverse else V.sub_mod(hi, lo)
        x = jnp.concatenate([lo[:, :, None, :], hi[:, :, None, :]],
                            axis=2).reshape(16, n)
    return x


def coeffs_of_evals(evals: jax.Array) -> jax.Array:
    return wavelet(evals, False)


def evals_of_coeffs(coeffs: jax.Array) -> jax.Array:
    return wavelet(coeffs, True)
