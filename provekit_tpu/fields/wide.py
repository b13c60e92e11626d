"""Wide-accumulator helpers: modular reductions of multi-term limb sums.

Segment-summed Montgomery products accumulate up to 2^16 terms per 16-bit
limb plane before overflowing uint32; these helpers renormalize such "wide"
columns back to canonical [0, P) limbs.  This is the TPU replacement for the
reference's serial sparse-matvec accumulation loops
(``provekit/common/src/sparse_matrix.rs:150-184``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bn254, vector as V
from .bn254 import NLIMBS


@jax.jit
def reduce_wide(cols: jax.Array) -> jax.Array:
    """(16, *batch) uint32 columns (each < 2^32, value < 2^16 * 2^256) -> mod P.

    Fold: value = extra*2^256 + lo  ==>  extra*R + lo (mod P), with
    extra*R computed as mont_mul(extra, R^2).
    """
    digits, extra = V._carry_norm(cols)  # 16 digits < 2^16, extra < 2^16
    lo = V.reduce_256(digits)
    batch = cols.shape[1:]
    extra_limbs = jnp.concatenate(
        [extra[None, ...], jnp.zeros((NLIMBS - 1, *batch), dtype=jnp.uint32)],
        axis=0)
    r2 = V.broadcast_scalar(jnp.asarray(V.R2_LIMBS), batch)
    hi = V.mont_mul(extra_limbs, r2)  # extra * R mod P
    return V.add_mod(lo, hi)


@functools.partial(jax.jit, static_argnums=(2,))
def segment_sum_mod(products: jax.Array, segment_ids: jax.Array,
                    num_segments: int) -> jax.Array:
    """Modular segment sum: (16, nnz) products -> (16, num_segments).

    Safe for up to 2^16 terms per segment (limb planes stay below 2^32).
    Callers with possibly-larger segments must pre-split them with
    ``split_oversized_segments`` and fold with ``segment_sum_mod_split``.
    """
    summed = jax.ops.segment_sum(
        products.T, segment_ids, num_segments=num_segments).T
    return reduce_wide(summed)


SEGMENT_CAP = 1 << 15


def split_oversized_segments(ids, num_segments: int, cap: int = SEGMENT_CAP):
    """Host-side: remap segment ids so no segment exceeds ``cap`` entries.

    u32 limb planes overflow past 2^16 summands, so giant segments (e.g.
    the LogUp balance rows summing one term per looked-up witness, or the
    constant-one column on the transpose side) must be summed in pieces.
    Returns ``(new_ids, extra_parent)``: ids >= num_segments are overflow
    sub-segments whose true segment is ``extra_parent[id - num_segments]``;
    ``extra_parent`` is None when nothing overflows.
    """
    ids = np.asarray(ids, dtype=np.int64)
    counts = np.bincount(ids, minlength=num_segments) if ids.size else \
        np.zeros(num_segments, dtype=np.int64)
    big = np.nonzero(counts > cap)[0]
    if big.size == 0:
        return ids.astype(np.int32), None
    new_ids = ids.copy()
    extra_parent = []
    next_id = num_segments
    for seg in big:
        pos = np.nonzero(ids == seg)[0]
        for k in range(cap, pos.size, cap):
            new_ids[pos[k:k + cap]] = next_id
            extra_parent.append(seg)
            next_id += 1
    return new_ids.astype(np.int32), np.asarray(extra_parent,
                                                dtype=np.int32)


def segment_sum_mod_split(products: jax.Array, seg_ids: jax.Array,
                          extra_parent, num_segments: int) -> jax.Array:
    """Segment sum over ids pre-split by ``split_oversized_segments``.

    Two passes: sub-segment sums (each <= SEGMENT_CAP terms), then the
    overflow sub-segments fold into their parents (each parent receives
    < 2^16 canonical sub-sums, so the second pass cannot overflow either).
    """
    if extra_parent is None:
        return segment_sum_mod(products, seg_ids, num_segments)
    total = num_segments + extra_parent.shape[0]
    s = segment_sum_mod(products, seg_ids, total)
    main, extras = s[:, :num_segments], s[:, num_segments:]
    folded = segment_sum_mod(extras, extra_parent, num_segments)
    return V.add_mod(main, folded)
