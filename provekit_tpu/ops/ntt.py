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


def _pease_flat(x, tw, rev, log_m: int, chunk: int):
    """Constant-geometry (Pease) DIF NTT along the major axis.

    ``x`` is (16, m*chunk) viewed as (16, m, chunk); the size-m transform
    runs over the major axis with the minor ``chunk`` axis batched in
    lanes.  Every stage is: contiguous half-split, fused Pallas butterfly,
    chunk-granularity interleave -- all reads/writes contiguous at ``chunk``
    granularity (element-granularity interleave is a minor-dim stride-2
    relayout, ~50x slower on TPU).  ``tw`` is the (16, m/2) table of w_m^k;
    DIF output order is fixed by the ``rev`` chunk permutation.
    """
    m = 1 << log_m
    if m == 1:
        return x
    n = x.shape[1]
    assert n == m * chunk
    half = n >> 1

    from . import pallas_kernels as PK

    fused = PK.ntt_stage_enabled(chunk)
    for s in range(log_m):
        # stage-s twiddle of major index k: w^{(k >> s) << s} -- the
        # stride-2^s decimation of the table (entry j >> s for chunk j)
        dec = tw if s == 0 else jax.lax.slice(
            tw, (0, 0), (16, (m >> 1) - (1 << s) + 1), (1, 1 << s))
        if fused:
            # butterfly + chunk interleave + in-VMEM twiddle broadcast in
            # ONE pass (see pallas_kernels.ntt_stage_pallas)
            x = PK.ntt_stage_pallas(x, dec, s, chunk)
            continue
        a = jax.lax.slice(x, (0, 0), (16, half))
        b = jax.lax.slice(x, (0, half), (16, n))
        rep = (1 << s) * chunk
        tw_s = jnp.broadcast_to(dec[:, :, None],
                                (16, m >> (s + 1), rep)).reshape(16, half)
        u, t = PK.butterfly_dispatch(a, b, tw_s)
        x = jnp.stack([u.reshape(16, half // chunk, chunk),
                       t.reshape(16, half // chunk, chunk)],
                      axis=2).reshape(16, n)

    return x.reshape(16, m, chunk)[:, rev].reshape(16, n)


# sizes up to this run single-phase; above, four-step (major-axis batched)
FOUR_STEP_MIN_LOG = 12


@functools.partial(jax.jit, static_argnums=(4, 5))
def _ntt_single(x, tw, rev, n_inv, log_n: int, inverse: bool):
    x = _pease_flat(x, tw, rev, log_n, 1)
    if inverse:
        x = V.mont_mul(x, jnp.broadcast_to(n_inv[:, None], x.shape))
    return x


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _ntt_four_step(x, tw1, rev1, cross, tw2, rev2, n_inv,
                   log_n1: int, log_n2: int, inverse: bool):
    """Four-step NTT: X[k1 + n1*k2] = NTT_n2( twiddle( NTT_n1(A) ) ).

    With A[j1][j2] = x[j1*n2 + j2]:
      B[k1][j2] = sum_j1 A[j1][j2] w1^{j1 k1}    (major-axis NTT, batch n2)
      C[k1][j2] = B[k1][j2] * w^{k1 j2}          (cross twiddles)
      transpose -> C'[j2][k1]
      D[k2][k1] = sum_j2 C'[j2][k1] w2^{j2 k2}   (major-axis NTT, batch n1)
      row-major flatten of D = X.
    """
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = n1 * n2
    from . import pallas_kernels as PK
    x = _pease_flat(x, tw1, rev1, log_n1, n2)
    x = PK.mont_mul_dispatch(x, cross)
    x = x.reshape(16, n1, n2).transpose(0, 2, 1).reshape(16, n)
    x = _pease_flat(x, tw2, rev2, log_n2, n1)
    if inverse:
        x = PK.mont_mul_dispatch(
            x, jnp.broadcast_to(n_inv[:, None], x.shape))
    return x


@functools.cache
def _power_table_full(log_n: int, inverse: bool) -> jax.Array:
    """(16, n) table of w^j for j < n, w of order 2^log_n (Montgomery)."""
    w = F.root_of_unity(log_n)
    if inverse:
        w = F.inv(w)
    tw = V.pack([F.to_mont(1)])
    for s in range(log_n):
        shift = V.broadcast_scalar(
            V.pack_scalar(F.to_mont(pow(w, 1 << s, F.P))), (1 << s,))
        tw = jnp.concatenate([tw, V.mont_mul(tw, shift)], axis=1)
    return tw


@functools.cache
def _cross_twiddles(log_n: int, log_n1: int, inverse: bool) -> jax.Array:
    """(16, n) cross-twiddle matrix T[k1*n2 + j2] = w^{k1*j2} (Montgomery)."""
    n = 1 << log_n
    n1, n2 = 1 << log_n1, n >> log_n1
    # one gather from the order-n power table, built once per size and
    # cached on device (w^{k1*j2}, k1*j2 <= (n1-1)(n2-1) < n)
    tw = _power_table_full(log_n, inverse)
    idx = (np.arange(n1, dtype=np.int64)[:, None]
           * np.arange(n2, dtype=np.int64)[None, :]).reshape(-1)
    return jnp.take(tw, jnp.asarray(idx, dtype=jnp.int32), axis=1)


def _ntt_core(x: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    n_inv = V.pack_scalar(F.to_mont(F.inv(1 << log_n)))
    if log_n <= FOUR_STEP_MIN_LOG:
        tw = _twiddle_table(log_n, inverse)
        rev = jnp.asarray(_bitrev_perm(log_n))
        return _ntt_single(x, tw, rev, n_inv, log_n, inverse)
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    return _ntt_four_step(
        x, _twiddle_table(log_n1, inverse), jnp.asarray(_bitrev_perm(log_n1)),
        _cross_twiddles(log_n, log_n1, inverse),
        _twiddle_table(log_n2, inverse), jnp.asarray(_bitrev_perm(log_n2)),
        n_inv, log_n1, log_n2, inverse)


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


def _force_device(device: bool) -> bool:
    """``device=True`` forces on-device unless syncs are declared cheap
    (config.CHEAP_SYNC: CPU-hermetic flows where a host tail beats a fresh
    one-op XLA compile)."""
    from .. import config
    return device and not config.CHEAP_SYNC


def ntt(x: jax.Array, device: bool = False) -> jax.Array:
    """Forward NTT: coefficients -> evaluations at [w^0, w^1, ..., w^(n-1)].

    ``device=True`` forces the on-device path at any size (the
    device-resident prover must not sync; host tails fetch/put)."""
    n = x.shape[1]
    if (not _force_device(device) and n <= HOST_TAIL
            and not isinstance(x, jax.core.Tracer)):
        return _dev(_host_ntt(_host(x), n.bit_length() - 1, False))
    return _ntt_core(x, n.bit_length() - 1, False)


def intt(x: jax.Array, device: bool = False) -> jax.Array:
    """Inverse NTT: evaluations -> coefficients."""
    n = x.shape[1]
    if (not _force_device(device) and n <= HOST_TAIL
            and not isinstance(x, jax.core.Tracer)):
        return _dev(_host_ntt(_host(x), n.bit_length() - 1, True))
    return _ntt_core(x, n.bit_length() - 1, True)


def rs_encode(coeffs: jax.Array, log_domain: int,
              device: bool = False) -> jax.Array:
    """Reed-Solomon encode: zero-pad coefficients to 2^log_domain, NTT."""
    n = coeffs.shape[1]
    domain = 1 << log_domain
    assert domain >= n
    if (not _force_device(device) and domain <= HOST_TAIL
            and not isinstance(coeffs, jax.core.Tracer)):
        vals = _host(coeffs) + [0] * (domain - n)
        return _dev(_host_ntt(vals, log_domain, False))
    padded = jnp.pad(coeffs, [(0, 0), (0, domain - n)])
    return _ntt_core(padded, log_domain, False)


def wavelet(evals: jax.Array, inverse: bool = False,
            device: bool = False) -> jax.Array:
    """Multilinear evals <-> coeffs (Mobius transform), MSB-first variables.

    Forward (evals->coeffs): for each variable, hi -= lo.
    Inverse (coeffs->evals): hi += lo.
    """
    n = evals.shape[1]
    if (not _force_device(device) and n <= HOST_TAIL
            and not isinstance(evals, jax.core.Tracer)):
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


# Stages pairing within a 128-lane vector register use roll+mask (a single
# cheap lane shift); the reshape/concat interleave at sub-lane strides costs
# ~5x in relayouts (measured 2^21 wavelet: 230 ms -> 87 ms on v5e).  The
# per-bit Mobius operators commute, so regime order is free.
_WAVELET_LANE_STAGES = 7


@functools.partial(jax.jit, static_argnums=(1,))
def _wavelet_dev(evals: jax.Array, inverse: bool = False) -> jax.Array:
    n = evals.shape[1]
    log_n = n.bit_length() - 1
    x = evals
    low = min(_WAVELET_LANE_STAGES, log_n)
    idx = jax.lax.iota(jnp.uint32, n)
    for s in range(low):
        half = 1 << s
        shifted = jnp.roll(x, half, axis=1)
        mask = (idx & jnp.uint32(half)) != 0
        y = V.add_mod(x, shifted) if inverse else V.sub_mod(x, shifted)
        x = jnp.where(mask[None, :], y, x)
    for s in range(low, log_n):
        half = 1 << s
        blocks = n >> (s + 1)
        xs = x.reshape(16, blocks, 2, half)
        lo, hi = xs[:, :, 0, :], xs[:, :, 1, :]
        hi = V.add_mod(hi, lo) if inverse else V.sub_mod(hi, lo)
        x = jnp.concatenate([lo[:, :, None, :], hi[:, :, None, :]],
                            axis=2).reshape(16, n)
    return x


def coeffs_of_evals(evals: jax.Array, device: bool = False) -> jax.Array:
    return wavelet(evals, False, device)


def evals_of_coeffs(coeffs: jax.Array, device: bool = False) -> jax.Array:
    return wavelet(coeffs, True, device)
