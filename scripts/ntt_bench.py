"""CM31 NTT benchmark vs the reference's published numbers.

The only absolute performance numbers the reference publishes are the
``cm31_ntt`` playground tables (``playground/cm31_ntt/README.md:54-70``):
radix-8 hybrid NTT on a Raspberry Pi 5, single thread —
322.63 ms at 8^7 = 2^21 points, 3.3564 s at 8^8 = 2^24 points.

Usage: python scripts/ntt_bench.py [log_n ...]   (default: 21 24)
Prints one JSON line per size with vs_baseline where published.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

# RPi5 single-thread ms for ntt_r8_hybrid_p (playground/cm31_ntt/README.md)
BASELINE_MS = {21: 322.63, 24: 3356.4}


def bench_one(log_n: int, iters: int = 20):
    from provekit_tpu.fields import m31

    n = 1 << log_n
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.integers(0, m31.P31, size=n, dtype=np.uint32))
    xi = jax.device_put(rng.integers(0, m31.P31, size=n, dtype=np.uint32))

    out = m31.cm31_ntt(xr, xi)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = m31.cm31_ntt(xr, xi)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3

    base = BASELINE_MS.get(log_n)
    print(json.dumps({
        "metric": f"cm31_ntt_2^{log_n}",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": None if base is None else round(base / ms, 1),
        "baseline_ms_rpi5": base,
        "platform": jax.devices()[0].platform,
    }))
    return ms


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [21, 24]
    for log_n in sizes:
        bench_one(log_n)
