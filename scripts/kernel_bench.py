"""Per-kernel throughput at production sizes (run on the TPU).

Usage: python scripts/kernel_bench.py [log_n]
Prints modmul / compress / NTT / sumcheck-round throughput for the XLA path
and the Pallas kernels.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n
    print(f"platform={jax.devices()[0].platform} device={jax.devices()[0]} "
          f"n=2^{log_n}")

    from provekit_tpu.fields import bn254 as F
    from provekit_tpu.fields import vector as V
    from provekit_tpu.hash import skyscraper as S
    from provekit_tpu.ops import ntt as ntt_mod
    from provekit_tpu.ops import pallas_kernels as PK
    from provekit_tpu.ops import sumcheck as sc

    rng = np.random.default_rng(0)
    # random montgomery-ish values: random 16-bit limbs, top limb < 2^12 (< P)
    def rand_arr(k):
        a = rng.integers(0, 1 << 16, size=(16, k), dtype=np.uint32)
        a[15] &= 0x0FFF
        return jax.device_put(a)

    a, b = rand_arr(n), rand_arr(n)

    t = timeit(V.mont_mul, a, b)
    print(f"mont_mul xla:     {t*1e3:8.2f} ms  {n/t/1e6:8.2f} M/s")
    try:
        t = timeit(PK.mont_mul_pallas, a, b)
        print(f"mont_mul pallas:  {t*1e3:8.2f} ms  {n/t/1e6:8.2f} M/s")
    except Exception as e:
        print(f"mont_mul pallas:  FAILED {type(e).__name__}")

    t = timeit(S.compress_v, a, b)
    print(f"compress xla:     {t*1e3:8.2f} ms  {n/t/1e6:8.2f} M/s")
    try:
        t = timeit(PK.compress_pallas, a, b)
        print(f"compress pallas:  {t*1e3:8.2f} ms  {n/t/1e6:8.2f} M/s")
    except Exception as e:
        print(f"compress pallas:  FAILED {type(e).__name__}")

    t = timeit(lambda x: ntt_mod._ntt_core(x, log_n, False), a)
    print(f"ntt xla:          {t*1e3:8.2f} ms  {n/t/1e6:8.2f} Mpt/s")

    c, e = rand_arr(n), rand_arr(n)
    t = timeit(sc._spartan_round_dev, a, b, c, e)
    print(f"spartan_round:    {t*1e3:8.2f} ms  {n/t/1e6:8.2f} Mrow/s")

    alpha = V.pack_scalar(12345)
    t = timeit(sc._fold_dev, a, alpha)
    print(f"fold:             {t*1e3:8.2f} ms  {n/t/1e6:8.2f} M/s")


if __name__ == "__main__":
    main()
