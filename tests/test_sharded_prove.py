"""The REAL prover, sharded: byte-identical proofs on a device mesh.

``scheme.prove(..., mesh=mesh)`` reshards every big array across the mesh
(parallel/context.py) so all prover kernels run SPMD — this is the TPU
replacement for the reference's rayon tree (SURVEY.md §2.10).  All limb
arithmetic is exact uint32 math, so the sharded transcript must equal the
single-device transcript bit for bit.

Each prove runs in its OWN subprocess (``tests/_sharded_prove_child.py``):
two proves with different mesh sizes in one process deterministically
segfault the XLA:CPU compiler on jaxlib 0.9.0 (crash requires the first
prove's in-process state; reproduced at `combine_eq_weights_dev` /
`powers` compiles, with and without the persistent compilation cache).
Subprocess isolation keeps the suite green AND keeps the real sharded
path under test; the byte comparison happens in the parent.
"""

import os
import subprocess
import sys

import pytest


def _child_prove(mesh_size: int, n_mults: int, out_path, extra_env=None,
                 timeout=1800) -> bytes:
    env = dict(os.environ)
    env.pop("PROVEKIT_TPU_CHEAP_SYNC", None)
    if extra_env:
        env.update(extra_env)
    subprocess.run(
        [sys.executable, "-m", "tests._sharded_prove_child",
         str(mesh_size), str(n_mults), str(out_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, check=True, timeout=timeout)
    return out_path.read_bytes()


@pytest.fixture(scope="module")
def base_proof(tmp_path_factory):
    """Single-device reference proof, computed once for all mesh sizes."""
    out = tmp_path_factory.mktemp("sharded") / "base.np"
    return _child_prove(1, 24, out)


def test_sharded_prove_bit_exact(tmp_path, base_proof):
    sharded = _child_prove(8, 24, tmp_path / "m8.np")
    assert sharded == base_proof


@pytest.mark.slow
def test_sharded_prove_bit_exact_m2(tmp_path, base_proof):
    """2-device mesh (different shard geometry than the default 8)."""
    sharded = _child_prove(2, 24, tmp_path / "m2.np")
    assert sharded == base_proof


@pytest.mark.slow
def test_sharded_prove_device_kernels_m14(tmp_path):
    """Mesh bit-identity at m >= 14 with host tails DISABLED.

    With PROVEKIT_TPU_HOST_TAIL=0 every sumcheck/NTT/eq kernel takes its
    device path at every size, so the bytes compared here come from the
    SPMD-partitioned device kernels themselves, not host-int fallbacks
    (round-3 verdict item 3b).  FUSE_MAX=0 keeps every round on the
    per-round kernels, the path the mesh actually uses.
    """
    force_device = {"PROVEKIT_TPU_HOST_TAIL": "0",
                    "PROVEKIT_TPU_FUSE_MAX": "0"}
    n_mults = 4100  # ~8.2k witnesses -> m = 14
    base = _child_prove(1, n_mults, tmp_path / "base.np",
                        extra_env=force_device, timeout=3600)
    sharded = _child_prove(8, n_mults, tmp_path / "m8.np",
                           extra_env=force_device, timeout=3600)
    assert sharded == base
