"""Vectorized BN254 Fr arithmetic on TPU: 16x16-bit limbs in uint32 lanes.

Design (TPU-first, replaces the reference's scalar/NEON/asm Montgomery
multipliers in ``skyscraper/block-multiplier``):

* A batch of field elements is a ``uint32`` array of shape ``(16, *batch)``
  — **limbs-first** so the batch dimension maps onto TPU vector lanes
  (the 8x128 VPU) and the 16 limbs map onto sublanes.  Each limb holds a
  16-bit digit (little-endian radix 2^16).
* Products of 16-bit digits fit exactly in uint32 (max (2^16-1)^2 + 2*(2^16-1)
  = 2^32-1), so schoolbook/CIOS accumulation never overflows a lane.
* Montgomery form (R = 2^256) is used in multiplication-heavy paths;
  canonical form where byte-level access is needed (Skyscraper "bar").

The reference's f64-FMA 52-bit-radix SIMD trick
(``skyscraper/block-multiplier/src/portable_simd.rs:16-378``) does not map to
TPU (no fast f64 FMA); the uint32 16-bit-radix plane layout here is the TPU
equivalent.  Differentially tested against ``fields.bn254`` int arithmetic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import bn254
from .bn254 import LIMB_BITS, LIMB_MASK, NLIMBS, P

U32 = jnp.uint32
_MASK = LIMB_MASK  # python literal: stays a jaxpr literal inside Pallas kernels


def _const_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 numpy limb vector (host-side constant)."""
    return np.array(bn254.to_limbs(x), dtype=np.uint32)


P_LIMBS = _const_limbs(P)
R2_LIMBS = _const_limbs(bn254.R2)
R3_LIMBS = _const_limbs(bn254.R3)
ONE_LIMBS = _const_limbs(1)
R_LIMBS = _const_limbs(bn254.R)  # == to_mont(1)
NPRIME16 = bn254.NPRIME16  # python literal
# -P^-1 mod 2^256 (full-width Montgomery factor for the SOS reduction).
NPRIME256 = (-pow(P, -1, 1 << 256)) % (1 << 256)
NPRIME256_LIMBS = _const_limbs(NPRIME256)
# k*P for k=0..3, used by reduce_256's quotient-estimate step.
PK_LIMBS = np.stack([_const_limbs(k * P) for k in range(4)])  # (4, 16); 3P < 2^256


# ---------------------------------------------------------------------------
# Packing


def pack(values, batch_shape=None) -> jax.Array:
    """List/iterable of ints (canonical, < P) -> (16, n) uint32 device array.

    Transfers uint16 limbs and widens on device — host->device bandwidth
    (a ~150 MB/s tunnel under axon) is the cost driver for large batches.
    """
    vals = list(values)
    blob = b"".join((v % P).to_bytes(32, "little") for v in vals)
    arr = np.frombuffer(blob, dtype="<u2").reshape(len(vals), NLIMBS)
    out = jnp.asarray(np.ascontiguousarray(arr.T)).astype(jnp.uint32)
    if batch_shape is not None:
        out = out.reshape((NLIMBS, *batch_shape))
    return out


def pack_scalar(v: int) -> jax.Array:
    """Single int -> (16,) uint32 device array."""
    return jnp.asarray(_const_limbs(v % P))


def unpack(arr) -> list[int]:
    """(16, n) limb array -> list of Python ints."""
    a = np.asarray(jax.device_get(arr)).reshape(NLIMBS, -1)
    blob = a.T.astype("<u2").tobytes()
    return [int.from_bytes(blob[32 * i:32 * (i + 1)], "little")
            for i in range(a.shape[1])]


def to_bytes_le_block(arr, check_canonical: bool = False) -> bytes:
    """(16, n) canonical limb array -> n*32 bytes (32-byte LE scalars).

    Vectorized equivalent of ``b"".join(F.to_bytes_le(v) for v in unpack(arr))``
    — the transcript-assembly hot path runs on numpy, not per-int Python.
    """
    a = np.asarray(jax.device_get(arr)).reshape(NLIMBS, -1)
    if check_canonical and a.shape[1]:
        lt = np.zeros(a.shape[1], dtype=bool)
        decided = np.zeros(a.shape[1], dtype=bool)
        for i in range(NLIMBS - 1, -1, -1):
            pi = int(P_LIMBS[i])
            lt |= ~decided & (a[i] < pi)
            decided |= a[i] != pi
        if not lt.all():
            raise AssertionError("non-canonical scalar in limb block")
    return a.T.astype("<u2").tobytes()


def unpack_scalar(arr) -> int:
    a = np.asarray(jax.device_get(arr)).reshape(NLIMBS)
    return bn254.from_limbs(a)


def zeros(batch_shape) -> jax.Array:
    return jnp.zeros((NLIMBS, *batch_shape), dtype=U32)


def broadcast_scalar(limbs: jax.Array, batch_shape) -> jax.Array:
    """(16,) -> (16, *batch_shape)."""
    return jnp.broadcast_to(limbs.reshape((NLIMBS,) + (1,) * len(batch_shape)),
                            (NLIMBS, *batch_shape))


def _as_limb_list(a: jax.Array) -> list[jax.Array]:
    return [a[i] for i in range(NLIMBS)]


def _from_limb_list(limbs: list[jax.Array]) -> jax.Array:
    return jnp.stack(limbs, axis=0)


def _bcast_const(c: np.ndarray, like: list[jax.Array]) -> list[int]:
    """Constant (16,) limbs -> python-int literals (Pallas-safe, weak-typed)."""
    return [int(c[i]) for i in range(NLIMBS)]


# ---------------------------------------------------------------------------
# Carry-chain primitives (operate on lists of 16 uint32 lanes, values < 2^16)


def _add_cc(a: list, b: list) -> tuple[list, jax.Array]:
    """Limbwise a+b with carry chain. Returns (limbs, carry_out in {0,1})."""
    out = []
    carry = 0
    for i in range(NLIMBS):
        s = a[i] + b[i] + carry
        out.append(s & _MASK)
        carry = s >> LIMB_BITS
    return out, carry


def _sub_bb(a: list, b: list) -> tuple[list, jax.Array]:
    """Limbwise a-b with borrow chain. Returns (limbs, borrow_out in {0,1})."""
    out = []
    borrow = 0
    for i in range(NLIMBS):
        d = a[i] - b[i] - borrow
        out.append(d & _MASK)
        borrow = d >> 31  # wrapped uint32 => top bit set
    return out, borrow


def _select(cond: jax.Array, t: list, f: list) -> list:
    """Per-lane select between two limb lists; cond is uint32/bool mask."""
    c = cond.astype(jnp.bool_)
    return [jnp.where(c, t[i], f[i]) for i in range(NLIMBS)]


def _cond_sub_p(limbs: list, extra: jax.Array) -> list:
    """Reduce value (extra*2^256 + limbs) < 2P into [0, P).

    When ``extra`` (0/1) is set the value is certainly >= P; subtracting P
    with wraparound in 16 limbs is exact because the 2^256 carry cancels the
    borrow.
    """
    p = _bcast_const(P_LIMBS, limbs)
    sub, borrow = _sub_bb(limbs, p)
    need = (extra | (1 - borrow)).astype(jnp.bool_)
    return _select(need, sub, limbs)


# ---------------------------------------------------------------------------
# Modular add/sub/neg (canonical or Montgomery — form-agnostic)


@jax.jit
def add_mod(a: jax.Array, b: jax.Array) -> jax.Array:
    al, bl = _as_limb_list(a), _as_limb_list(b)
    s, carry = _add_cc(al, bl)
    return _from_limb_list(_cond_sub_p(s, carry))


@jax.jit
def sub_mod(a: jax.Array, b: jax.Array) -> jax.Array:
    al, bl = _as_limb_list(a), _as_limb_list(b)
    d, borrow = _sub_bb(al, bl)
    # If borrowed, add P back (wraparound cancels).
    p = _bcast_const(P_LIMBS, d)
    fixed, _ = _add_cc(d, p)
    return _from_limb_list(_select(borrow, fixed, d))


@jax.jit
def neg_mod(a: jax.Array) -> jax.Array:
    al = _as_limb_list(a)
    p = _bcast_const(P_LIMBS, al)
    d, _ = _sub_bb(p, al)
    is_zero = is_zero_mask(a)
    return _from_limb_list(_select(is_zero, al, d))


def is_zero_mask(a: jax.Array) -> jax.Array:
    """Boolean mask over batch dims: element == 0."""
    acc = a[0]
    for i in range(1, NLIMBS):
        acc = acc | a[i]
    return acc == 0


def eq_mask(a: jax.Array, b: jax.Array) -> jax.Array:
    acc = a[0] ^ b[0]
    for i in range(1, NLIMBS):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


def select(mask: jax.Array, t: jax.Array, f: jax.Array) -> jax.Array:
    """mask over batch dims chooses t (True) or f per element."""
    return jnp.where(mask[None, ...], t, f)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS over 16-bit limbs)


def _conv_cols(a: jax.Array, b: jax.Array, ncols: int) -> jax.Array:
    """Column sums of the digit product a*b (schoolbook convolution).

    a, b: (16, *batch) with digits < 2^16.  Returns (ncols, *batch) uint32
    column values < 32*2^16 (safe: products are split hi/lo immediately).
    Sequential accumulation keeps peak memory at O(ncols * batch).
    """
    batch = a.shape[1:]
    cols = jnp.zeros((ncols, *batch), dtype=U32)

    def zrows(k):
        return jnp.zeros((k, *batch), dtype=U32)

    def shifted(rows, off):
        # place `rows` at row offset `off` within ncols rows (concat, no scatter
        # — Mosaic has no scatter-add)
        take = min(rows.shape[0], ncols - off)
        if take <= 0:
            return None
        parts = []
        if off:
            parts.append(zrows(off))
        parts.append(rows[:take])
        rest = ncols - off - take
        if rest:
            parts.append(zrows(rest))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    for i in range(NLIMBS):
        prod = a[i] * b  # (16, *batch) exact in uint32
        lo = shifted(prod & _MASK, i)
        hi = shifted(prod >> LIMB_BITS, i + 1)
        if lo is not None:
            cols = cols + lo
        if hi is not None:
            cols = cols + hi
    return cols


def _carry_norm(cols: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Propagate carries: (n, *batch) cols < 2^27 -> n digits < 2^16 + extra.

    The total value must fit in n+1 digits; ``extra`` is digit n (zero in all
    in-range uses, or discarded for mod-2^256 truncation).  Two redundant
    carry-save rounds shrink digits to ~2^16, then one strict 0/1-carry chain
    finishes — short dependency chains, XLA-friendly.
    """
    n = cols.shape[0]
    batch = cols.shape[1:]
    cols = jnp.concatenate(
        [cols, jnp.zeros((1, *batch), dtype=U32)], axis=0)
    for _ in range(2):
        lo = cols & _MASK
        hi = cols >> LIMB_BITS
        # hi of the top row is 0 by bounds; shift-add via concat (no scatter)
        cols = lo + jnp.concatenate(
            [jnp.zeros((1, *batch), dtype=U32), hi[:-1]], axis=0)
    digits = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n + 1):
        s = cols[i] + carry
        digits.append(s & _MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(digits[:n]), digits[n]


def mont_mul_core(a: jax.Array, b: jax.Array, p_arr: jax.Array,
                  np_arr: jax.Array) -> jax.Array:
    """Montgomery product a*b*R^-1 mod P (R = 2^256), SOS formulation.

    TPU-native replacement for the reference's Montgomery kernels
    (``skyscraper/block-multiplier/src/scalar.rs:12-206`` and the aarch64
    interleaved asm).  Separated-operand-scanning shape: three digit
    convolutions with deferred carries instead of CIOS's 32 interleaved
    sequential carry chains — far fewer, shallower XLA ops.

      T = a*b;  m = (T mod R) * (-P^-1) mod R;  res = (T + m*P) / R  (< 2P)

    ``p_arr``/``np_arr`` are the (16,) constant vectors P and -P^-1 mod 2^256,
    passed explicitly so Pallas kernels can supply them as inputs.
    """
    batch = a.shape[1:]
    # T = a*b: 32 digit columns
    t_cols = _conv_cols(a, b, 32)
    t, t_top = _carry_norm(t_cols)  # t_top == 0 (T < P^2 < 2^508)

    # m = T_lo * NPRIME256 mod 2^256
    np_limbs = jnp.broadcast_to(
        np_arr.reshape((NLIMBS,) + (1,) * len(batch)), (NLIMBS, *batch))
    m_cols = _conv_cols(t[:NLIMBS], np_limbs, NLIMBS)
    m, _ = _carry_norm(m_cols)  # mod 2^256: drop carry

    # S = T + m*P; result = S >> 256 (low 256 bits are zero by construction)
    p_limbs = jnp.broadcast_to(
        p_arr.reshape((NLIMBS,) + (1,) * len(batch)), (NLIMBS, *batch))
    s_cols = _conv_cols(m, p_limbs, 32)
    s_cols = s_cols + t  # same shape; .at[] would emit an empty scatter index
    s, s_top = _carry_norm(s_cols)  # S < 2*R*P < 2^512; s_top==0, res < 2P

    res = [s[NLIMBS + i] for i in range(NLIMBS)]
    return _from_limb_list(_cond_sub_p(res, s_top))


@jax.jit
def _mont_mul_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    return mont_mul_core(a, b, jnp.asarray(P_LIMBS),
                         jnp.asarray(NPRIME256_LIMBS))


# Minimum flattened batch for the Pallas fast path.  Measured on TPU v5e at
# 2^18: Pallas mont_mul ~220 M/s vs ~24 M/s for the XLA lowering (the
# concat-based digit shifts in _conv_cols defeat XLA fusion and round-trip
# ~100 column temporaries through HBM; the Pallas kernel keeps one
# (16, tile) tile VMEM-resident end to end) — scripts/speed_of_light.py.
PALLAS_MIN_BATCH = 4096


def _pallas_batch(a: jax.Array) -> int:
    """Flattened batch size if the Pallas kernels apply to this array, else 0.

    Conditions: (16, ...) limb array, batch >= PALLAS_MIN_BATCH and
    tile-divisible, Pallas enabled (TPU), and no active mesh (Pallas calls
    are not SPMD-partitionable by GSPMD)."""
    if a.ndim < 2:
        return 0
    n = 1
    for d in a.shape[1:]:
        n *= d
    if n < PALLAS_MIN_BATCH or n % 512:
        return 0
    from ..ops import pallas_kernels as PK
    if not PK._pallas_enabled():
        return 0
    from ..parallel import context as pctx
    if pctx.active_mesh() is not None:
        return 0
    return n


def mont_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product; large batches take the Pallas VMEM kernel.

    Safe inside jit traces (pallas_call nests under jit); Pallas-kernel
    internals use ``mont_mul_core`` directly and never re-enter here.
    """
    n = _pallas_batch(a)
    if n and a.shape == b.shape:
        from ..ops import pallas_kernels as PK
        out = PK.mont_mul_pallas(a.reshape(NLIMBS, n), b.reshape(NLIMBS, n))
        return out.reshape(a.shape)
    return _mont_mul_xla(a, b)


def mont_sqr(a: jax.Array) -> jax.Array:
    return mont_mul(a, a)


@jax.jit
def to_mont(a: jax.Array) -> jax.Array:
    r2 = broadcast_scalar(jnp.asarray(R2_LIMBS), a.shape[1:])
    return mont_mul(a, r2)


@jax.jit
def from_mont(a: jax.Array) -> jax.Array:
    one = broadcast_scalar(jnp.asarray(ONE_LIMBS), a.shape[1:])
    return mont_mul(a, one)


def from_mont_chunked(a: jax.Array, max_elems: int = 1 << 19) -> jax.Array:
    """``from_mont`` with bounded peak memory for huge arrays.

    ``mont_mul`` materializes ~6 live (32, batch) u32 column temporaries;
    on multi-million-element batches (WHIR leaf matrices at m=20+) that
    peaks at several GB of HBM.  Sequentially mapping 2^19-element chunks
    caps the transient working set at ~100 MB without changing results.
    """
    batch = 1
    for d in a.shape[1:]:
        batch *= d
    if batch <= max_elems:
        return from_mont(a)
    flat = a.reshape(NLIMBS, batch)
    nch = -(-batch // max_elems)
    pad = nch * max_elems - batch
    if pad:
        flat = jnp.pad(flat, [(0, 0), (0, pad)])
    chunks = jnp.moveaxis(flat.reshape(NLIMBS, nch, max_elems), 1, 0)
    out = jax.lax.map(from_mont, chunks)
    out = jnp.moveaxis(out, 0, 1).reshape(NLIMBS, nch * max_elems)
    return out[:, :batch].reshape(a.shape)


@jax.jit
def mul_std(a: jax.Array, b: jax.Array) -> jax.Array:
    """Canonical-form product: a*b mod P for canonical (non-Montgomery) inputs."""
    r2 = broadcast_scalar(jnp.asarray(R2_LIMBS), a.shape[1:])
    return mont_mul(mont_mul(a, b), r2)


def sqr_std(a: jax.Array) -> jax.Array:
    return mul_std(a, a)


# ---------------------------------------------------------------------------
# Generic 256-bit reduction (for byte-level re-interpretation, Skyscraper bar)


@jax.jit
def reduce_256(a: jax.Array) -> jax.Array:
    """Reduce an arbitrary 256-bit value (16 limbs) mod P.

    Quotient estimate from the top two bits (P is 254-bit), then two
    conditional subtracts.  Mirrors the role of
    ``skyscraper/core/src/reduce.rs`` ``reduce_partial``.
    """
    al = _as_limb_list(a)
    q = al[NLIMBS - 1] >> (LIMB_BITS - 2)  # 0..3
    # q*P limbs (q traced, P limbs literal): values < 2^18, then normalize.
    qp = [q * int(P_LIMBS[i]) for i in range(NLIMBS)]
    norm = []
    carry = 0
    for i in range(NLIMBS):
        sv = qp[i] + carry
        norm.append(sv & _MASK)
        carry = sv >> LIMB_BITS
    # carry out is 0: q*P < 2^256
    x, _ = _sub_bb(al, norm)  # no borrow possible: q*P <= value
    x = _cond_sub_p(x, jnp.zeros_like(x[0]))
    x = _cond_sub_p(x, jnp.zeros_like(x[0]))
    return _from_limb_list(x)


# ---------------------------------------------------------------------------
# Exponentiation / inversion


@functools.partial(jax.jit, static_argnums=(1,))
def mont_pow(a: jax.Array, e: int) -> jax.Array:
    """a^e in Montgomery form (a is aR, result is a^e * R). Static exponent."""
    if e == 0:
        return broadcast_scalar(jnp.asarray(R_LIMBS), a.shape[1:])
    bits = [int(b) for b in bin(e)[2:]]  # MSB first
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

    def body(i, acc):
        acc = mont_mul(acc, acc)
        mul = mont_mul(acc, a)
        return select((bits_arr[i] == 1), mul, acc)

    acc = a
    out = jax.lax.fori_loop(1, len(bits), body, acc)
    return out


@jax.jit
def mont_inv(a: jax.Array) -> jax.Array:
    """Inverse in Montgomery form: (aR) -> a^-1 R.  a must be nonzero."""
    return mont_pow(a, P - 2)


@functools.partial(jax.jit, static_argnums=(1,))
def batch_inv_mont(a: jax.Array, zero_to_zero: bool = True) -> jax.Array:
    """Batched inversion in Montgomery form via prefix/suffix scans.

    inv(a_i) = prefix_i * suffix_i * S^-1 with S the total product — the
    Montgomery-trick (one field inversion total), log-depth on TPU via
    ``associative_scan`` (the reference's sequential trick is latency-bound).

    a: (16, n). Zeros map to zero when zero_to_zero (LogUp solvers rely on it).
    """
    n = a.shape[1]
    zmask = is_zero_mask(a)
    r1 = broadcast_scalar(jnp.asarray(R_LIMBS), a.shape[1:])
    aa = select(zmask, r1, a)  # replace 0 -> 1 (mont)

    # Inclusive prefix & suffix products along the batch axis.
    scan = lambda x, y: mont_mul(x, y)
    prefix = jax.lax.associative_scan(scan, aa, axis=1)
    suffix = jax.lax.associative_scan(scan, aa, axis=1, reverse=True)
    total = prefix[:, n - 1:n]  # (16,1)
    total_inv = mont_inv(total)

    # exclusive prefix/suffix
    one_col = broadcast_scalar(jnp.asarray(R_LIMBS), (1,))
    eprefix = jnp.concatenate([one_col, prefix[:, :-1]], axis=1)
    esuffix = jnp.concatenate([suffix[:, 1:], one_col], axis=1)

    inv = mont_mul(mont_mul(eprefix, esuffix),
                   jnp.broadcast_to(total_inv, a.shape))
    if zero_to_zero:
        inv = select(zmask, zeros((n,)), inv)
    return inv


# ---------------------------------------------------------------------------
# Reductions


@functools.partial(jax.jit, static_argnums=(1,))
def sum_mod(a: jax.Array, axis: int = 1) -> jax.Array:
    """Modular sum over one batch axis via halving tree (axis >= 1).

    Halves IN PLACE along ``axis`` (no moveaxis): transposing a large
    minor axis behind a tiny one forces (8,128)-tile padding of the tiny
    minor dim — observed as a 128x-padded 16 GB temp on TPU when reducing
    (16, p, 2^21) over the last axis.
    """
    n = a.shape[axis]
    m = 1 if n == 0 else 1 << (n - 1).bit_length()
    if m != n:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, m - n)
        a = jnp.pad(a, pad)
    while a.shape[axis] > 1:
        h = a.shape[axis] // 2
        lo = jax.lax.slice_in_dim(a, 0, h, axis=axis)
        hi = jax.lax.slice_in_dim(a, h, 2 * h, axis=axis)
        a = add_mod(lo, hi)
    return jnp.squeeze(a, axis=axis)


@jax.jit
def dot_mont(a: jax.Array, b: jax.Array) -> jax.Array:
    """Modular dot product of two (16, n) Montgomery vectors -> (16,)."""
    return sum_mod(mont_mul(a, b), axis=1)
