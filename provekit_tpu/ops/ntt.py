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
def _twiddle_table(log_n: int, inverse: bool = False) -> jax.Array:
    """(16, n/2) device table of w^k (Montgomery form), w of order 2^log_n.

    Built by on-device log-doubling (T ‖ T·w^|T|) and passed to the jitted
    NTT as an *argument* — baking it in as a compile-time constant ships
    up to hundreds of MB in the compile request (the axon remote-compile
    tunnel rejects those) and defeats XLA constant-dedup across sizes.
    """
    w = F.root_of_unity(log_n)
    if inverse:
        w = F.inv(w)
    tw = V.pack([F.to_mont(1)])
    for s in range(log_n - 1):
        shift = V.broadcast_scalar(
            V.pack_scalar(F.to_mont(pow(w, 1 << s, F.P))), (1 << s,))
        tw = jnp.concatenate([tw, V.mont_mul(tw, shift)], axis=1)
    return tw


@functools.partial(jax.jit, static_argnums=(3, 4))
def _ntt_core_impl(x: jax.Array, tw: jax.Array, rev: jax.Array,
                   log_n: int, inverse: bool) -> jax.Array:
    """In-order forward/inverse NTT of (16, n) Montgomery values.

    Constant-geometry (Pease) decimation-in-frequency: every stage is the
    same static-shape program — split halves, butterfly against a gathered
    twiddle slice of the order-n table, interleave — so the whole transform
    is ONE ``fori_loop`` stage body.  An unrolled radix-2 ladder at
    log_n≈21 produced a 100k-op HLO graph (minutes of XLA compile, and a
    compile payload the remote-compile tunnel rejects); this compiles in
    seconds at any size.  Output order of DIF is bit-reversed, fixed by a
    final gather.
    """
    n = 1 << log_n
    if n == 1:
        return x
    half = n >> 1
    iota = jnp.arange(half, dtype=jnp.int32)

    def stage(s, x):
        a = jax.lax.slice(x, (0, 0), (16, half))
        b = jax.lax.slice(x, (0, half), (16, n))
        # stage-s twiddle of lane k: w^{(k >> s) << s}
        e = jnp.left_shift(jnp.right_shift(iota, s), s)
        t = V.mont_mul(V.sub_mod(a, b), jnp.take(tw, e, axis=1))
        u = V.add_mod(a, b)
        return jnp.stack([u, t], axis=2).reshape(16, n)

    x = jax.lax.fori_loop(0, log_n, stage, x)
    x = x[:, rev]
    if inverse:
        n_inv = V.broadcast_scalar(
            V.pack_scalar(F.to_mont(F.inv(n))), x.shape[1:])
        x = V.mont_mul(x, n_inv)
    return x


def _ntt_core(x: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    tw = _twiddle_table(log_n, inverse)
    rev = jnp.asarray(_bitrev_perm(log_n))
    return _ntt_core_impl(x, tw, rev, log_n, inverse)


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
