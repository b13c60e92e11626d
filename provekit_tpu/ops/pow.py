"""Proof-of-work grinding (WHIR round grinding) on TPU.

Replaces ``skyscraper/core/src/pow.rs`` + the rayon nonce grid
(``generic.rs:42-71``): condition is ``compress(challenge, nonce) <
threshold`` with ``threshold ~ 2^-difficulty * p`` computed through the same
f64 path as the reference (``pow.rs:14-22, 44-82``), including the +0.01-bit
prover bias.  The TPU solver scans nonce blocks with one batched compress per
block — embarrassingly parallel, shardable across chips.
"""

from __future__ import annotations

import struct

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..hash import skyscraper as S

PROVER_BIAS = 0.01
BLOCK = 4096


def _f64_parts(f: float) -> tuple[bool, int, int]:
    bits = struct.unpack("<Q", struct.pack("<d", f))[0]
    sign = bits >> 63 != 0
    exp_bits = (bits >> 52) & 0x7FF
    frac = bits & ((1 << 52) - 1)
    if exp_bits == 0:
        return sign, -1022, frac
    return sign, exp_bits - 1023, frac + (1 << 52)


def _f64_to_u256(f: float) -> int:
    if f != f:  # NaN -> MAX (matches reference's exp>256 branch)
        return (1 << 256) - 1
    sign, exp, significand = _f64_parts(f)
    if sign:
        return 0
    if exp > 256:
        return (1 << 256) - 1
    shift = exp - 52
    if shift < 0:
        # round-half-even like Rust f64::round? Rust rounds half away from 0;
        # only reachable for tiny thresholds (difficulty ~ field bits).
        return int(f + 0.5)
    return significand << shift


def threshold(difficulty: float) -> int:
    assert 0.0 <= difficulty < 80.0, "difficulty must be in [0, 80)"
    modulus = float(F.P >> 192) * 2.0 ** 192
    prob = 2.0 ** (-difficulty)
    return min(_f64_to_u256(prob * modulus), (1 << 256) - 1)


def verify(challenge: int, difficulty: float, nonce: int) -> bool:
    if difficulty == 0.0:
        return True
    return S.compress(challenge, nonce) < threshold(difficulty)


import functools


@functools.lru_cache(maxsize=8)
def _nonce_limbs(block: int, offset: int) -> jax.Array:
    """Limb planes for nonces [offset, offset+block) — cached on device
    (the offset-0 block is reused across every grind of a proof)."""
    nonces = np.arange(block, dtype=np.uint64) + np.uint64(offset)
    limbs = np.zeros((16, block), dtype=np.uint32)
    for i in range(4):
        limbs[i] = ((nonces >> np.uint64(16 * i))
                    & np.uint64(0xFFFF)).astype(np.uint32)
    return jnp.asarray(limbs)


def _less_than_mask(a: jax.Array, bound: int) -> jax.Array:
    bl = [jnp.uint32((bound >> (16 * i)) & 0xFFFF) for i in range(16)]
    _, borrow = V._sub_bb(V._as_limb_list(a), bl)
    return borrow == 1


def _block_size(difficulty: float) -> int:
    return 1 << min(26, max(12, int(difficulty) + 2))


@functools.partial(jax.jit, static_argnums=(1,))
def _solve_dev_jit(challenge: jax.Array, difficulty: float) -> jax.Array:
    """Device grind: (16,1) canonical challenge -> (16,1) canonical nonce.

    Same scan order as :func:`solve` (blocks of the same size, smallest
    index within the first succeeding block), so host and device paths find
    the SAME nonce — transcripts stay byte-identical.  Runs as a
    ``while_loop`` entirely on device (no host sync per block).
    """
    from ..hash import skyscraper as S
    from . import pallas_kernels as PK
    block = _block_size(difficulty)
    thresh = threshold(difficulty + PROVER_BIAS)
    tl = [jnp.uint32((thresh >> (16 * i)) & 0xFFFF) for i in range(16)]
    ch = jnp.broadcast_to(challenge, (16, block))
    base = jnp.arange(block, dtype=jnp.uint32)
    use_pallas = PK._pallas_enabled() and block >= 4096

    def nonce_limbs(offset):
        lo = base + offset
        limbs = [lo & jnp.uint32(0xFFFF), lo >> 16]
        limbs += [jnp.zeros_like(lo)] * 14
        return jnp.stack(limbs)

    def attempt(offset):
        nl = nonce_limbs(offset)
        if use_pallas:
            hashes = PK.compress_pallas(ch, nl)
        else:
            hashes = S.compress_v.__wrapped__(ch, nl)
        _, borrow = V._sub_bb(V._as_limb_list(hashes), tl)
        mask = borrow == 1
        return mask.any(), offset + jnp.argmax(mask).astype(jnp.uint32)

    found0, nonce0 = attempt(jnp.uint32(0))

    def cond(carry):
        found, _, _ = carry
        return ~found

    def body(carry):
        _, _, offset = carry
        offset = offset + jnp.uint32(block)
        found, nonce = attempt(offset)
        return found, nonce, offset

    found, nonce, _ = jax.lax.while_loop(
        cond, body, (found0, nonce0, jnp.uint32(0)))
    limbs = [nonce & jnp.uint32(0xFFFF), nonce >> 16]
    limbs += [jnp.zeros((), jnp.uint32)] * 14
    return jnp.stack(limbs).reshape(16, 1)


def solve_host_sequential(challenge: int, difficulty: float) -> int:
    """First satisfying nonce by sequential scan (== the device solver's
    smallest-in-first-hit-block nonce; same biased threshold)."""
    if difficulty == 0.0:
        return 0
    from .. import native
    cmp = native.compress if native.available() else S.compress
    thresh = threshold(difficulty + PROVER_BIAS)
    nonce = 0
    while cmp(challenge, nonce) >= thresh:
        nonce += 1
    return nonce


def solve_dev(challenge: jax.Array, difficulty: float) -> jax.Array:
    """(16,1) canonical device challenge -> (16,1) canonical device nonce."""
    if difficulty == 0.0:
        return jnp.zeros((16, 1), dtype=jnp.uint32)
    from .. import config
    if (config.CHEAP_SYNC and difficulty <= 12.0
            and not isinstance(challenge, jax.core.Tracer)):
        ch = V.unpack_scalar(challenge)
        return V.pack([solve_host_sequential(ch, difficulty)])
    return _solve_dev_jit(challenge, difficulty)


def solve(challenge: int, difficulty: float, block: int | None = None,
          max_blocks: int = 1 << 14) -> int:
    """Find the smallest-in-block nonce satisfying the PoW condition.

    The block is sized to ~4x the expected number of tries (rounded to a
    power of two) so the grind usually completes in ONE device dispatch —
    per-dispatch transport latency dominates the hash compute.
    """
    if difficulty == 0.0:
        return 0
    if block is None:
        block = _block_size(difficulty)
    thresh = threshold(difficulty + PROVER_BIAS)
    ch = V.broadcast_scalar(V.pack_scalar(challenge), (block,))
    for blk in range(max_blocks):
        offset = blk * block
        from . import pallas_kernels as PK
        hashes = PK.compress_dispatch(ch, _nonce_limbs(block, offset))
        mask = np.asarray(_less_than_mask(hashes, thresh))
        if mask.any():
            nonce = offset + int(np.nonzero(mask)[0][0])
            assert verify(challenge, difficulty, nonce)
            return nonce
    raise RuntimeError("PoW solver exhausted nonce budget")
