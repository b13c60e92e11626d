"""Pallas TPU kernels for the hot compute paths.

The XLA path lowers each field op as fused elementwise HLO, but sequential
chains (the 18 Skyscraper rounds, CIOS stages) round-trip HBM between steps.
These kernels keep the whole computation VMEM-resident per tile:

* ``mont_mul_pallas``: batched Montgomery product, one (16, TILE) tile per
  grid step.
* ``compress_pallas``: full Skyscraper compression (18 rounds + feed-forward)
  in a single kernel — the Merkle/PoW workhorse.

All kernels reuse the exact jnp limb algebra from ``fields.vector`` (it
traces into Mosaic vector ops), so correctness is inherited from the
differentially-tested field layer.  Select with ``PROVEKIT_TPU_PALLAS=1``
(auto-enabled on TPU platforms for supported shapes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import bn254 as F
from ..fields import vector as V

TILE = 512


def _pallas_enabled() -> bool:
    # pallas_call is not GSPMD-partitionable: XLA fallback under a mesh —
    # EXCEPT inside a shard_map body, where arrays are per-shard local and
    # the kernels are legal (parallel/context.py::shard_body)
    from ..parallel import context as pctx
    if pctx.active_mesh() is not None and not pctx.in_shard_body():
        return False
    env = os.environ.get("PROVEKIT_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False




def _out_struct(shape, ref):
    """ShapeDtypeStruct for pallas outputs, propagating the input's vma.

    Inside a shard_map body (check_vma=True) outputs must declare how they
    vary over the mesh axes; copy the varying-axes set from a representative
    input so the kernels work both standalone and per-shard."""
    vma = getattr(jax.core.get_aval(ref), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.uint32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


# ---------------------------------------------------------------------------
# Montgomery multiply


def _mont_mul_kernel(consts_ref, a_ref, b_ref, out_ref):
    out_ref[:] = V.mont_mul_core(a_ref[:], b_ref[:], consts_ref[0],
                                 consts_ref[1])


@functools.partial(jax.jit, static_argnums=())
def mont_mul_pallas(a: jax.Array, b: jax.Array) -> jax.Array:
    n = a.shape[1]
    # 1024 measured best on v5e (224 M/s vs 221 at 512, 187 at 4096)
    tile = min(2 * TILE, n)
    assert n % tile == 0
    import numpy as _np
    consts = jnp.asarray(_np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    return pl.pallas_call(
        _mont_mul_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((2, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((16, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((16, n), a),
    )(consts, a, b)


def mont_mul_dispatch(a: jax.Array, b: jax.Array) -> jax.Array:
    if (_pallas_enabled() and a.ndim == 2 and a.shape[1] >= 2048
            and a.shape[1] % min(TILE, a.shape[1]) == 0):
        return mont_mul_pallas(a, b)
    return V.mont_mul(a, b)


# ---------------------------------------------------------------------------
# NTT butterfly (constant-geometry DIF stage)


def _butterfly_kernel(consts_ref, a_ref, b_ref, tw_ref, u_ref, t_ref):
    a, b = a_ref[:], b_ref[:]
    u_ref[:] = V.add_mod.__wrapped__(a, b)
    t_ref[:] = V.mont_mul_core(V.sub_mod.__wrapped__(a, b), tw_ref[:],
                               consts_ref[0], consts_ref[1])


@jax.jit
def butterfly_pallas(a: jax.Array, b: jax.Array, tw: jax.Array):
    """DIF butterfly: returns (a+b, (a-b)*tw) — one VMEM-resident pass.

    The XLA lowering of mont_mul materializes (32, n) column intermediates
    in HBM per limb step; fusing sub+mont_mul+add per tile keeps the whole
    butterfly VMEM-resident (the NTT stage is the RS-encoding hot op).
    """
    n = a.shape[1]
    tile = min(TILE, n)
    assert n % tile == 0
    import numpy as _np
    consts = jnp.asarray(_np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    spec = pl.BlockSpec((16, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _butterfly_kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((2, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(_out_struct((16, n), a),
                   _out_struct((16, n), a)),
    )(consts, a, b, tw)


def butterfly_dispatch(a: jax.Array, b: jax.Array, tw: jax.Array):
    if (_pallas_enabled() and a.ndim == 2 and a.shape[1] >= 2048
            and a.shape[1] % min(TILE, a.shape[1]) == 0):
        return butterfly_pallas(a, b, tw)
    return V.add_mod(a, b), V.mont_mul(V.sub_mod(a, b), tw)


# ---------------------------------------------------------------------------
# Fused NTT stage: butterfly + chunk interleave in one pass
#
# The generic stage costs three HBM passes: materialize the broadcast
# twiddle array, butterfly (read a,b,tw / write u,t), then the
# stack+reshape chunk interleave (read u,t / write x').  With the grid
# blocked at CHUNK granularity each step j can write the contiguous
# [u_j ‖ t_j] span of the interleaved output directly, and the stage
# twiddle collapses to ONE scalar per step (index j >> s of the decimated
# table) broadcast in VMEM: ~2 HBM passes total (read x, write x').


def _ntt_stage_kernel(s_ref, consts_ref, tw_ref, a_ref, b_ref, out_ref):
    a, b = a_ref[:], b_ref[:]
    chunk = a.shape[1]
    idx = pl.program_id(0) >> s_ref[0]
    # dynamic lane loads need provable 128-alignment; select the stage
    # twiddle with an iota mask + lane reduction instead (one hot => exact)
    dec_len = tw_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (16, dec_len), 1)
    sel = jnp.where(lanes == idx, tw_ref[:].astype(jnp.int32), 0)
    tw_col = jnp.sum(sel, axis=1, keepdims=True).astype(jnp.uint32)
    tw = jnp.broadcast_to(tw_col, (16, chunk))
    out_ref[:, :chunk] = V.add_mod.__wrapped__(a, b)
    out_ref[:, chunk:] = V.mont_mul_core(
        V.sub_mod.__wrapped__(a, b), tw, consts_ref[0], consts_ref[1])


@functools.partial(jax.jit, static_argnums=(2, 3))
def ntt_stage_pallas(x: jax.Array, dec: jax.Array, s: int,
                     chunk: int) -> jax.Array:
    """One constant-geometry DIF stage over (16, n) with chunk interleave.

    ``dec`` is the stage-decimated twiddle table (16, m >> (s+1)); step j
    handles a-chunk j (at j*chunk) and b-chunk j (at half + j*chunk),
    writing [a+b ‖ (a-b)*dec[j >> s]] at 2*j*chunk.
    """
    n = x.shape[1]
    half = n // 2
    steps = half // chunk
    dec_len = dec.shape[1]
    import numpy as _np
    consts = jnp.asarray(_np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    s_arr = jnp.asarray([s], dtype=jnp.int32)
    return pl.pallas_call(
        _ntt_stage_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 16), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            # whole decimated table resident (constant index map); the
            # kernel takes its one scalar with a dynamic lane slice
            pl.BlockSpec((16, dec_len), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, chunk), lambda j: (0, steps + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 2 * chunk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((16, n), x),
    )(s_arr, consts, dec, x, x)


def ntt_stage_enabled(chunk: int) -> bool:
    """The fused stage needs chunk-aligned VMEM blocks of a sane size."""
    return _pallas_enabled() and 256 <= chunk <= 4096


# ---------------------------------------------------------------------------
# Skyscraper compression


def _compress_kernel(rc_ref, consts_ref, l_ref, r_ref, out_ref):
    from ..hash import skyscraper as S
    from ..parallel import context as pctx
    l0 = l_ref[:]
    # unroll only under shard_map (vma carry-type check misfires on the
    # fori inside kernel traces there); the fori version compiles faster
    l, r = S._permute_core(l0, r_ref[:], lambda k: rc_ref[k, :],
                           consts_ref[0], consts_ref[1],
                           unroll=pctx.in_shard_body())
    out_ref[:] = V.add_mod.__wrapped__(l, l0)


@functools.partial(jax.jit, static_argnums=())
def compress_pallas(l: jax.Array, r: jax.Array) -> jax.Array:
    from ..hash import skyscraper as S
    n = l.shape[1]
    tile = min(TILE, n)
    assert n % tile == 0
    rc = jnp.asarray(S._RC_LIMBS)
    import numpy as _np
    consts = jnp.asarray(_np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    return pl.pallas_call(
        _compress_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((18, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((16, n), l),
    )(rc, consts, l, r)


def compress_dispatch(l: jax.Array, r: jax.Array) -> jax.Array:
    """compress_v with the Pallas fast path for power-of-two batches.

    Measured on TPU v5e at n=2^18: 1.75 G compress/s (Pallas, VMEM-resident
    rounds) vs 0.83 G/s (XLA, HBM round-trips between rounds).  Small
    batches (Merkle tree tops, sponge-adjacent hashing) also go through
    Pallas: the XLA lowering of one 18-round permute costs ~1.8 ms of
    latency-bound HBM round-trips, the VMEM-resident kernel ~20 us.
    """
    from ..hash import skyscraper as S
    from ..parallel import context as pctx
    n = l.shape[-1]
    # inside shard_map bodies the kernel must UNROLL its 18 rounds (see
    # _compress_kernel), which costs ~12 s of Mosaic compile per shape —
    # only worth it for the big levels; small per-shard levels stay on XLA
    min_n = 2048 if pctx.in_shard_body() else 1
    if (_pallas_enabled() and l.ndim == 2 and n >= min_n
            and n % min(TILE, n) == 0 and (n & (n - 1)) == 0):
        return compress_pallas(l, r)
    return S.compress_v(l, r)


# ---------------------------------------------------------------------------
# Skyscraper permutation (sponge step) — tiny-batch latency path


def _permute_kernel(rc_ref, consts_ref, l_ref, r_ref, lo_ref, ro_ref):
    from ..hash import skyscraper as S
    from ..parallel import context as pctx
    l, r = S._permute_core(l_ref[:], r_ref[:], lambda k: rc_ref[k, :],
                           consts_ref[0], consts_ref[1],
                           unroll=pctx.in_shard_body())
    lo_ref[:] = l
    ro_ref[:] = r


@jax.jit
def permute_pallas(l: jax.Array, r: jax.Array):
    from ..hash import skyscraper as S
    n = l.shape[1]
    rc = jnp.asarray(S._RC_LIMBS)
    import numpy as _np
    consts = jnp.asarray(_np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _permute_kernel,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(_out_struct((16, n), l),
                   _out_struct((16, n), l)),
    )(rc, consts, l, r)


def permute_dispatch(l: jax.Array, r: jax.Array):
    """Sponge permutation: VMEM-resident Pallas kernel on TPU, XLA fallback.

    The Fiat-Shamir sponge is a single-lane sequential chain — per-permute
    latency (not throughput) gates the prover; see fs.device."""
    from ..hash import skyscraper as S
    if _pallas_enabled() and l.ndim == 2 and l.shape[1] > 0:
        return permute_pallas(l, r)
    return S.permute_v.__wrapped__(l, r)
