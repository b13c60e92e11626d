"""Child process for the sharded-prove tests: ONE prove per process.

Running two proves with different mesh sizes in a single process reliably
segfaults the XLA:CPU compiler on this jaxlib (0.9.0) — the crash needs the
first prove's in-process compiled state and lands at varying compile sites
(`backend_compile_and_load`, cache serialize/deserialize) during the second
prove's SPMD compiles; a single prove of either kind always succeeds.
Isolating each prove in its own process sidesteps the compiler bug while
still exercising the real sharded `prove()` path end to end.

Usage: python -m tests._sharded_prove_child <mesh_size> <n_mults> <out_path>
Env: PROVEKIT_TPU_HOST_TAIL / PROVEKIT_TPU_FUSE_MAX may be set by the
parent to force the device kernels at every size (no host tails).
"""

import os
import sys


def main():
    mesh_size = int(sys.argv[1])
    n_mults = int(sys.argv[2])
    out_path = sys.argv[3]

    flag = "--xla_force_host_platform_device_count=8"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import random

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

    from provekit_tpu.parallel import make_mesh
    from tests.test_e2e import build_system
    from tests.test_verifier_circuit import tiny_scheme

    r1cs, witness = build_system(seed=5, n_mults=n_mults)
    scheme = tiny_scheme(r1cs, security=10, folding=2, max_pow=2)
    proof = scheme.prove(r1cs, witness, rng=random.Random(3),
                         mesh=make_mesh(mesh_size))
    scheme.verify(r1cs, proof)  # host verifier accepts before reporting
    with open(out_path, "wb") as f:
        f.write(proof)


if __name__ == "__main__":
    main()
