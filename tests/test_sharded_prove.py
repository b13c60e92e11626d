"""The REAL prover, sharded: byte-identical proofs on a device mesh.

``scheme.prove(..., mesh=mesh)`` reshards every big array across the mesh
(parallel/context.py) so all prover kernels run SPMD — this is the TPU
replacement for the reference's rayon tree (SURVEY.md §2.10).  All limb
arithmetic is exact uint32 math, so the sharded transcript must equal the
single-device transcript bit for bit.
"""

import random

import jax
import pytest

from provekit_tpu.parallel import make_mesh
from tests.test_e2e import build_system
from tests.test_verifier_circuit import tiny_scheme


def _prove_pair(n_devices: int, n_mults: int = 24):
    r1cs, witness = build_system(seed=5, n_mults=n_mults)
    scheme = tiny_scheme(r1cs, security=10, folding=2, max_pow=2)
    # 1-device mesh baseline: both proves use the per-round kernels (the
    # fused-segment kernels cost minutes per shape under the SPMD
    # partitioner on this 2-vCPU host; fused==per-round bit-equality is
    # pinned separately by test_device_fs::test_proof_bytes_regression_mesh).
    base = scheme.prove(r1cs, witness, rng=random.Random(3),
                        mesh=make_mesh(1))
    mesh = make_mesh(n_devices)
    sharded = scheme.prove(r1cs, witness, rng=random.Random(3), mesh=mesh)
    return scheme, r1cs, base, sharded


def test_sharded_prove_bit_exact_2dev():
    scheme, r1cs, base, sharded = _prove_pair(2)
    assert sharded == base
    scheme.verify(r1cs, sharded)


def test_sharded_prove_bit_exact_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scheme, r1cs, base, sharded = _prove_pair(8)
    assert sharded == base
    scheme.verify(r1cs, sharded)
