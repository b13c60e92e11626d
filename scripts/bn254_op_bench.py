"""Microbenchmarks of the BN254 prover hot ops on the current device.

Times each device op in isolation (warm, amortized over iters) so kernel
work can be prioritized: wavelet, four-step NTT, rs_encode, Merkle commit,
fused sumcheck segments, mont_mul throughput.

Usage: python scripts/bn254_op_bench.py [log_n]   (default 17)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Fetch one scalar of the output — under the tunneled axon platform
    ``block_until_ready`` can return before execution completes, so a
    device_get is the only reliable completion barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def timeit(name, fn, iters=30):
    _force(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn()
    out = fn()
    _force(out)  # executions are in-order: one barrier drains all iters
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<36} {ms:9.3f} ms")
    return ms


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << log_n
    from provekit_tpu.fields import vector as V
    from provekit_tpu.ops import merkle, ntt
    from provekit_tpu.ops import pallas_kernels as PK
    from provekit_tpu.ops import fused

    g = np.random.default_rng(0)
    x = jnp.asarray(g.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    y = jnp.asarray(g.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    print(f"device={jax.devices()[0].platform} n=2^{log_n}")

    timeit("mont_mul (XLA)", lambda: V.mont_mul(x, y))
    timeit("mont_mul (pallas)", lambda: PK.mont_mul_dispatch(x, y))
    timeit("add_mod", lambda: V.add_mod(x, y))
    timeit("wavelet fwd", lambda: ntt.wavelet(x, False, device=True))
    timeit("ntt 2^log_n", lambda: ntt.ntt(x, device=True))
    timeit("rs_encode (rate 1/2)",
           lambda: ntt.rs_encode(x, log_n + 1, device=True))
    leaves = x.reshape(16, 32, n // 32)
    timeit("merkle commit (leaf=32)",
           lambda: merkle.commit_dev(leaves).levels[-1])
    fw = jnp.stack([x, y], axis=1)
    state = V.pack([1, 2]).reshape(16, 2)
    timeit("whir_sumcheck_segment x4",
           lambda: fused.whir_sumcheck_segment(fw, state, 4)[0])
    timeit("sponge permute x18 (1 lane)",
           lambda: fused._permute_state(state))


if __name__ == "__main__":
    main()
