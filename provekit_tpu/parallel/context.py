"""Active-mesh context: opt-in multi-chip sharding of the real prover.

TPU-native scaling recipe (jax-ml scaling-book): pick a mesh, annotate the
shardings of the big arrays, and let XLA's SPMD partitioner insert the
collectives.  The prover (`protocol/scheme.py`, `protocol/spartan.py`,
`whir/{committer,prover}.py`) is host-sequenced over jitted device ops on
(16, n) limb-plane arrays; under an active mesh every array materialization
point reshards the big axis across devices with ``jax.device_put``, so all
downstream jitted ops compile as SPMD programs (the input sharding is part
of the jit cache key).  Per-round sums, Merkle levels and NTT transposes
become ``psum``/``all_gather``/``all_to_all`` exchanges chosen by XLA; the
sequential Fiat-Shamir sponge stays replicated (it is (16, 2)-tiny and every
shard advances it identically).

All arithmetic is exact uint32 limb math, so partitioning cannot change a
single bit: a sharded ``prove()`` emits byte-identical transcripts to the
single-device path (asserted by ``tests/test_sharded_prove.py`` and the
driver's ``dryrun_multichip``).

Replaces the reference's rayon shared-memory tree (SURVEY.md §2.10 —
``common/src/utils/sumcheck.rs:53-86``) with mesh parallelism.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Mesh | None = None

# Below this many elements per shard the collective latency dominates any
# compute win; keep the array replicated.  (Tuned loosely; correctness does
# not depend on it — sharded and unsharded paths are bit-identical.)
MIN_PER_SHARD = 2


def active_mesh() -> Mesh | None:
    return _ACTIVE


_IN_SHARD_BODY = False


def in_shard_body() -> bool:
    return _IN_SHARD_BODY


@contextmanager
def shard_body():
    """Mark a ``shard_map`` body trace: kernels see per-shard LOCAL arrays.

    ``pallas_call`` is not GSPMD-partitionable, so kernel dispatches fall
    back to XLA whenever a mesh is active — EXCEPT inside a shard_map body,
    where shapes are already local to one device and Pallas is legal again.
    The mesh module wraps its body functions with this marker so the
    per-shard compute keeps the VMEM-resident kernels (round-4 verdict
    item 6: the compress kernel is 12x the XLA lowering)."""
    global _IN_SHARD_BODY
    prev = _IN_SHARD_BODY
    _IN_SHARD_BODY = True
    try:
        yield
    finally:
        _IN_SHARD_BODY = prev


@contextmanager
def use_mesh(mesh: Mesh | None):
    """Run a prove (or any prover stage) with its big arrays mesh-sharded."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def shard_last(x):
    """Reshard a device array so its LAST axis is split over the mesh.

    No-op without an active mesh, when the axis does not divide the mesh
    size, or when the per-shard slice would be tiny.
    """
    mesh = _ACTIVE
    if mesh is None or not hasattr(x, "ndim"):
        return x
    s = int(mesh.devices.size)
    n = x.shape[-1]
    if s <= 1 or n % s or n // s < MIN_PER_SHARD:
        return x
    spec = P(*([None] * (x.ndim - 1)), mesh.axis_names[0])
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x):
    """Explicitly replicate a small array across the mesh."""
    mesh = _ACTIVE
    if mesh is None or not hasattr(x, "ndim"):
        return x
    return jax.device_put(x, NamedSharding(mesh, P()))
