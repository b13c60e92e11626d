"""MXU Montgomery-multiply experiment (round-5 verdict item 3).

The VPU SOS kernel (fields/vector.py::mont_mul_core) spends its ~1120
model ops/elem on three 16x16 digit convolutions + carry chains.  Two of
the three convolutions multiply by a CONSTANT 256-bit value (NPRIME256 and
P) — a digit convolution with a fixed operand is literally a matmul
``(n, planes) @ band_matrix`` and can ride the MXU (int8 or exact-f32
paths), leaving only the varying-operand a*b convolution + carries on the
VPU.  For broadcast-scalar products (sumcheck folds by a shared alpha,
eq-table levels, power ladders) the varying conv disappears too: the
shared scalar's band matrix is built once per call on device.

Reference analog: skyscraper/block-multiplier/src/portable_simd.rs:16-378
moves limb products onto the NEON FMA pipes; here the analogous "other
unit" is the MXU systolic array.

Variants measured (all exact, differentially tested vs V.mont_mul):

  A. mont_mul_mxu_f32   - 8-bit digit planes, f32 matmuls (exact: products
                          16 bits x 32 accumulands = 21 bits < 24-bit
                          mantissa), for the two constant convolutions.
  B. mont_mul_mxu_int8  - 4-bit digit planes, int8 matmuls with int32
                          accumulation.
  C. mul_scalar_mxu_f32 - broadcast-scalar Montgomery product with ALL
                          THREE convolutions on the MXU.

Outputs one JSON document with throughputs vs the VPU baselines.
Usage: python scripts/mxu_mont_experiment.py [log_n]
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V

NLIMBS = 16
MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# digit-plane conversions


def to_u8_planes(a):
    """(16, n) u32 with 16-bit digits -> (n, 32) f32 with 8-bit digits."""
    lo = (a & 0xFF).astype(jnp.float32)
    hi = ((a >> 8) & 0xFF).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=1).reshape(32, -1).T  # (n, 32)


def to_u4_planes_i8(a):
    """(16, n) u32 with 16-bit digits -> (n, 64) int8 with 4-bit digits."""
    parts = [((a >> (4 * t)) & 0xF).astype(jnp.int8) for t in range(4)]
    return jnp.stack(parts, axis=1).reshape(64, -1).T  # (n, 64)


def band_matrix(c: int, in_planes: int, out_cols: int, digit_bits: int,
                dtype):
    """Band matrix B[i, k] = digit_{k-i}(c): (n, in) @ B == digit conv."""
    nd = out_cols
    digits = [(c >> (digit_bits * j)) & ((1 << digit_bits) - 1)
              for j in range(nd)]
    B = np.zeros((in_planes, out_cols), dtype=np.float32)
    for i in range(in_planes):
        for k in range(i, out_cols):
            if k - i < len(digits):
                B[i, k] = digits[k - i]
    return jnp.asarray(B.astype(dtype))


B_NP_F32 = band_matrix(V.NPRIME256, 32, 32, 8, np.float32)     # mod 2^256
B_P_F32 = band_matrix(F.P, 32, 64, 8, np.float32)              # full width
B_NP_I8 = band_matrix(V.NPRIME256, 64, 64, 4, np.int8)
B_P_I8 = band_matrix(F.P, 64, 128, 4, np.int8)


def cols8_to_digits16(cols_t):
    """(n, 2k) u32 8-bit column sums (< 2^22) -> (2k/2... ) -> (k, n) u32
    16-bit column values (< 2^31), ready for V._carry_norm."""
    c = cols_t.T  # (2k, n)
    even = c[0::2]
    odd = c[1::2]
    return even + (odd << 8)


def cols4_to_digits16(cols_t):
    """(n, 4k) u32 4-bit column sums (< 2^15) -> (k, n) u32 16-bit cols."""
    c = cols_t.T
    return c[0::4] + (c[1::4] << 4) + (c[2::4] << 8) + (c[3::4] << 12)


# ---------------------------------------------------------------------------
# Variant A: f32 MXU for the two constant convolutions


@jax.jit
def mont_mul_mxu_f32(a, b):
    t_cols = V._conv_cols(a, b, 32)                 # VPU: varying operands
    t, _ = V._carry_norm(t_cols)                    # (32, n) 16-bit digits

    tlo8 = to_u8_planes(t[:NLIMBS])                 # (n, 32)
    m_cols = jnp.dot(tlo8, B_NP_F32,
                     precision=jax.lax.Precision.HIGHEST)  # (n, 32) f32
    m16 = cols8_to_digits16(m_cols.astype(jnp.uint32))
    m, _ = V._carry_norm(m16)                       # (16, n) digits of m

    m8 = to_u8_planes(m)                            # (n, 32)
    s_cols = jnp.dot(m8, B_P_F32,
                     precision=jax.lax.Precision.HIGHEST)  # (n, 64)
    s16 = cols8_to_digits16(s_cols.astype(jnp.uint32))     # (32, n)
    s, s_top = V._carry_norm(s16 + t)
    res = [s[NLIMBS + i] for i in range(NLIMBS)]
    return V._from_limb_list(V._cond_sub_p(res, s_top))


# ---------------------------------------------------------------------------
# Variant B: int8 MXU


@jax.jit
def mont_mul_mxu_int8(a, b):
    t_cols = V._conv_cols(a, b, 32)
    t, _ = V._carry_norm(t_cols)

    tlo4 = to_u4_planes_i8(t[:NLIMBS])              # (n, 64) int8
    m_cols = jax.lax.dot_general(
        tlo4, B_NP_I8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)           # (n, 64)
    m16 = cols4_to_digits16(m_cols.astype(jnp.uint32))
    m, _ = V._carry_norm(m16)

    m4 = to_u4_planes_i8(m)
    s_cols = jax.lax.dot_general(
        m4, B_P_I8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)           # (n, 128)
    s16 = cols4_to_digits16(s_cols.astype(jnp.uint32))
    s, s_top = V._carry_norm(s16 + t)
    res = [s[NLIMBS + i] for i in range(NLIMBS)]
    return V._from_limb_list(V._cond_sub_p(res, s_top))


# ---------------------------------------------------------------------------
# Variant C: broadcast scalar — all three convolutions on MXU


def dyn_band_f32(s_digits8, in_planes, out_cols):
    """Band matrix from a TRACED scalar's 8-bit digits (s_digits8: (d,))."""
    rows = []
    for i in range(in_planes):
        row = jnp.zeros((out_cols,), dtype=jnp.float32)
        take = min(out_cols - i, s_digits8.shape[0])
        row = jax.lax.dynamic_update_slice(
            row, s_digits8[:take].astype(jnp.float32), (i,))
        rows.append(row)
    return jnp.stack(rows)  # (in_planes, out_cols)


@jax.jit
def mul_scalar_mxu_f32(a, s):
    """Montgomery product of (16, n) a with a single (16, 1) scalar s."""
    s_dig = jnp.stack([(s[:, 0] & 0xFF), (s[:, 0] >> 8) & 0xFF],
                      axis=1).reshape(32)
    B_s = dyn_band_f32(s_dig, 32, 64)
    a8 = to_u8_planes(a)                            # (n, 32)
    t_cols = jnp.dot(a8, B_s, precision=jax.lax.Precision.HIGHEST)
    t16 = cols8_to_digits16(t_cols.astype(jnp.uint32))  # (32, n)
    t, _ = V._carry_norm(t16)

    tlo8 = to_u8_planes(t[:NLIMBS])
    m_cols = jnp.dot(tlo8, B_NP_F32, precision=jax.lax.Precision.HIGHEST)
    m16 = cols8_to_digits16(m_cols.astype(jnp.uint32))
    m, _ = V._carry_norm(m16)

    m8 = to_u8_planes(m)
    s_cols = jnp.dot(m8, B_P_F32, precision=jax.lax.Precision.HIGHEST)
    s16 = cols8_to_digits16(s_cols.astype(jnp.uint32))
    ss, s_top = V._carry_norm(s16 + t)
    res = [ss[NLIMBS + i] for i in range(NLIMBS)]
    return V._from_limb_list(V._cond_sub_p(res, s_top))


@jax.jit
def mul_scalar_vpu(a, s):
    return V.mont_mul(a, jnp.broadcast_to(s, a.shape))


# ---------------------------------------------------------------------------
# Variant D: Pallas kernel with the MXU dots INSIDE (VMEM-resident).
# Planes-first layout throughout — the dots are (32,32)@(32,tile) and
# (64,32)@(32,tile) with the band matrices pre-transposed, so no Mosaic
# transposes are needed.

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT_NP_F32 = B_NP_F32.T    # (32, 32): out_cols x in_planes
BT_P_F32 = B_P_F32.T      # (64, 32)


def _planes8(x16):
    """(16, t) u32 16-bit digits -> (32, t) f32 8-bit digit planes.

    Mosaic has no u32->f32 cast; route through i32 (values < 2^16)."""
    lo = (x16 & 0xFF).astype(jnp.int32).astype(jnp.float32)
    hi = ((x16 >> 8) & 0xFF).astype(jnp.int32).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=1).reshape(32, x16.shape[1])


def _digits16_from8(cols_f32):
    """(2k, t) f32 8-bit col sums (< 2^22, exact) -> (k, t) u32 cols."""
    cols = cols_f32.astype(jnp.int32).astype(jnp.uint32)
    k2, t = cols.shape
    c = cols.reshape(k2 // 2, 2, t)
    return c[:, 0, :] + (c[:, 1, :] << 8)


def _mont_mul_mxu_kernel(consts_ref, bnp_ref, bp_ref, a_ref, b_ref,
                         out_ref):
    a, b = a_ref[:], b_ref[:]
    t_cols = V._conv_cols(a, b, 32)
    t, _ = V._carry_norm(t_cols)
    m_cols = jax.lax.dot_general(
        bnp_ref[:], _planes8(t[:NLIMBS]), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)          # (32, tile) f32
    m, _ = V._carry_norm(_digits16_from8(m_cols))
    s_cols = jax.lax.dot_general(
        bp_ref[:], _planes8(m), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)          # (64, tile) f32
    s16 = _digits16_from8(s_cols)                     # (32, tile)
    s, s_top = V._carry_norm(s16 + t)
    res = [s[NLIMBS + i] for i in range(NLIMBS)]
    out_ref[:] = V._from_limb_list(V._cond_sub_p(res, s_top))


@jax.jit
def mont_mul_mxu_pallas(a, b):
    n = a.shape[1]
    tile = min(1024, n)
    consts = jnp.asarray(np.stack([V.P_LIMBS, V.NPRIME256_LIMBS]))
    return pl.pallas_call(
        _mont_mul_mxu_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((2, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
    )(consts, BT_NP_F32, BT_P_F32, a, b)


# ---------------------------------------------------------------------------


def check(fn, a_vals, b_vals, a, b):
    out = V.unpack(fn(a, b))
    R_inv = pow(F.R, -1, F.P)
    for i, (x, y, got) in enumerate(zip(a_vals, b_vals, out)):
        want = x * y * R_inv % F.P
        if got % F.P != want:
            return f"MISMATCH at {i}"
    return "exact"


def bench(fn, a, b, iters=20):
    fn(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n
    rng = np.random.default_rng(1)
    a_vals = [int.from_bytes(rng.bytes(32), "little") % F.P
              for _ in range(256)]
    b_vals = [int.from_bytes(rng.bytes(32), "little") % F.P
              for _ in range(256)]
    a_small = V.pack(a_vals)
    b_small = V.pack(b_vals)

    rows = {"device": str(jax.devices()[0]), "log_n": log_n, "checks": {},
            "throughput_M_per_s": {}}

    # correctness on small batches
    rows["checks"]["mxu_f32"] = check(mont_mul_mxu_f32, a_vals, b_vals,
                                      a_small, b_small)
    rows["checks"]["mxu_int8"] = check(mont_mul_mxu_int8, a_vals, b_vals,
                                       a_small, b_small)
    try:
        rows["checks"]["mxu_pallas"] = check(
            mont_mul_mxu_pallas, a_vals, b_vals, a_small, b_small)
    except Exception as e:
        rows["checks"]["mxu_pallas"] = f"ERROR: {e!r}"[:300]
    s_val = b_vals[0]
    out = V.unpack(mul_scalar_mxu_f32(a_small, V.pack([s_val])))
    R_inv = pow(F.R, -1, F.P)
    ok = all(g % F.P == x * s_val * R_inv % F.P
             for g, x in zip(out, a_vals))
    rows["checks"]["scalar_mxu_f32"] = "exact" if ok else "MISMATCH"

    # throughput at scale
    big_a = jnp.tile(a_small, (1, n // 256))
    big_b = jnp.tile(b_small, (1, n // 256))
    s1 = V.pack([s_val])

    variants = [("vpu_xla", V._mont_mul_xla),
                ("mxu_f32", mont_mul_mxu_f32),
                ("mxu_int8", mont_mul_mxu_int8)]
    if rows["checks"].get("mxu_pallas") == "exact":
        variants.append(("mxu_pallas", mont_mul_mxu_pallas))
    for name, fn in variants:
        dt = bench(fn, big_a, big_b)
        rows["throughput_M_per_s"][name] = round(n / dt / 1e6, 1)

    for name, fn in [("scalar_vpu", mul_scalar_vpu),
                     ("scalar_mxu_f32", mul_scalar_mxu_f32)]:
        dt = bench(fn, big_a, s1)
        rows["throughput_M_per_s"][name] = round(n / dt / 1e6, 1)

    try:
        from provekit_tpu.ops import pallas_kernels as PK
        if PK._pallas_enabled():
            dt = bench(lambda x, y: V.mont_mul(x, y), big_a, big_b)
            rows["throughput_M_per_s"]["vpu_pallas_dispatch"] = round(
                n / dt / 1e6, 1)
    except Exception as e:  # pragma: no cover
        rows["pallas_error"] = repr(e)

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
