"""Per-kernel throughput + speed-of-light accounting -> KERNELS JSON.

Methodology (tunneled-TPU-safe):
* sync via a TINY-output jitted probe (sum of 8 lanes) -> device_get of a
  few bytes.  ``block_until_ready`` returns too early under the axon
  tunnel; fetching the full result would bill host<->device transfer
  (~hundreds of MB/s) to the kernel.
* per-op cost = (time of N dispatches + tip sync) / N, N large enough to
  amortize the ~3 ms tunnel round trip per dispatch.

Speed-of-light model per kernel (v5e-class chip, per chip):
* VPU bound: ~1970 u32 GOP/s  (8 x 128 lanes x 2 ops x ~960 MHz; int ops
  have no MXU path for our 16-bit-limb planes).
* HBM bound: ~819 GB/s.
The table reports achieved rate, the bound that binds, and % of that bound.

Usage: python scripts/speed_of_light.py [log_n] [out.json]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

VPU_GOPS = 1970e9   # u32 lane-ops/s, v5e (8x128x2 per cycle @ ~960 MHz)
HBM_BPS = 819e9     # bytes/s, v5e


@jax.jit
def _tip(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    flat = leaf.reshape(-1)
    return jnp.sum(flat[:8])


def sync(x):
    return np.asarray(jax.device_get(_tip(x)))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    n = 1 << log_n

    from provekit_tpu.fields import vector as V
    from provekit_tpu.hash import skyscraper as S
    from provekit_tpu.ops import ntt as ntt_mod
    from provekit_tpu.ops import pallas_kernels as PK
    from provekit_tpu.ops import sumcheck as sc
    from provekit_tpu.ops import fused

    rng = np.random.default_rng(0)

    def rand_arr(k):
        a = rng.integers(0, 1 << 16, size=(16, k), dtype=np.uint32)
        a[15] &= 0x0FFF
        return jax.device_put(a)

    a, b = rand_arr(n), rand_arr(n)
    tw = rand_arr(n)
    dev = jax.devices()[0]
    rows = []

    def record(name, seconds, elems, ops_per_elem, bytes_moved):
        """ops_per_elem: u32 lane-ops per element (model); bytes_moved:
        min HBM traffic (read inputs + write outputs once)."""
        rate = elems / seconds
        vpu_bound = VPU_GOPS / ops_per_elem          # elems/s if VPU-bound
        hbm_bound = HBM_BPS / (bytes_moved / elems)  # elems/s if HBM-bound
        bound = "VPU" if vpu_bound < hbm_bound else "HBM"
        sol = min(vpu_bound, hbm_bound)
        rows.append({
            "kernel": name, "n": elems, "ms": round(seconds * 1e3, 3),
            "rate_M_per_s": round(rate / 1e6, 1),
            "model_ops_per_elem": ops_per_elem,
            "bound": bound,
            "sol_M_per_s": round(sol / 1e6, 1),
            "pct_of_sol": round(100 * rate / sol, 1),
        })
        print(f"{name:<28} {seconds*1e3:9.3f} ms  {rate/1e6:9.1f} M/s  "
              f"{100*rate/sol:5.1f}% of {bound} SoL ({sol/1e6:.0f} M/s)")

    # -- mont_mul: ~1120 lane-ops/elem (3 convs ~256 mul+add pairs + carry
    #    normalization), 3 x 64B in/out
    t = timeit(V.mont_mul, a, b)
    record("mont_mul_xla", t, n, 1120, 3 * 64 * n)
    try:
        t = timeit(PK.mont_mul_pallas, a, b)
        record("mont_mul_pallas", t, n, 1120, 3 * 64 * n)
    except Exception as e:
        print("mont_mul_pallas FAILED", type(e).__name__)

    # -- add_mod: ~80 ops/elem (carry chain + cond-sub), 3 x 64B
    t = timeit(V.add_mod, a, b)
    record("add_mod_xla", t, n, 80, 3 * 64 * n)

    # -- butterfly (a+b, (a-b)*tw): mont_mul + 2 addsub
    t = timeit(lambda x, y, w: PK.butterfly_dispatch(x, y, w), a, b, tw)
    record("butterfly", t, n, 1280, 5 * 64 * n)

    # -- skyscraper compress: ~12 squares + 4 bar rounds ~ 14.5k ops/elem
    t = timeit(S.compress_v, a, b)
    record("compress_xla", t, n, 14500, 3 * 64 * n)
    try:
        t = timeit(PK.compress_pallas, a, b)
        record("compress_pallas", t, n, 14500, 3 * 64 * n)
    except Exception as e:
        print("compress_pallas FAILED", type(e).__name__)

    # -- full NTT (one dispatch): log_n stages x butterfly/2 per elem
    stages = log_n
    t = timeit(lambda x: ntt_mod._ntt_core(x, log_n, False), a)
    record("ntt_full", t, n, 1280 * stages // 2,
           (2 * stages) * 64 * n)  # per-stage read+write

    # -- wavelet: log_n stages of add/sub over half the array
    t = timeit(lambda x: ntt_mod._wavelet_dev(x, False), a)
    record("wavelet", t, n, 80 * stages // 2, (2 * stages) * 64 * n)

    # -- spartan round (a,b,c,eq stacked): ~5 mont_mul + sums per PAIR
    abce = jnp.stack([a, b, a, b], axis=1)
    t = timeit(sc._spartan_round_stacked_dev, abce)
    record("spartan_round", t, n // 2, 2 * 5 * 1120, 4 * 64 * n)

    # -- whir fused segment (4 rounds in one dispatch); rounds are unrolled
    #    with halving shapes, so the op model is geometric:
    #    sum_j (n/2^{j+1}) pairs x 6 muls = 6*1120*n*(1 - 2^-4) total
    fw = jnp.stack([a, b], axis=1)
    st = jax.device_put(np.zeros((16, 2), np.uint32))
    t = timeit(lambda f, s: fused.whir_sumcheck_segment(f, s, 4), fw, st)
    record("whir_segment_x4", t, n // 2,
           int(2 * 6 * 1120 * (1 - 0.5 ** 4)), 2 * 64 * n)

    # -- dispatch floor
    t = timeit(lambda x: x + jnp.uint32(1), a)
    rows.append({"kernel": "dispatch_floor", "ms": round(t * 1e3, 3)})
    print(f"{'dispatch_floor':<28} {t*1e3:9.3f} ms")

    doc = {
        "device": str(dev), "platform": dev.platform, "log_n": log_n,
        "model": {"vpu_gops": VPU_GOPS, "hbm_Bps": HBM_BPS},
        "kernels": rows,
    }
    if out_path:
        pathlib.Path(out_path).write_text(json.dumps(doc, indent=1))
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
