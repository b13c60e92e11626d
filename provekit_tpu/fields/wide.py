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
    """
    summed = jax.ops.segment_sum(
        products.T, segment_ids, num_segments=num_segments).T
    return reduce_wide(summed)
