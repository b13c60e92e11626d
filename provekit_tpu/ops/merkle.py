"""Skyscraper Merkle tree: batched TPU layer hashing + host path verification.

Replaces the reference's ark ``MerkleTree<SkyscraperMerkleConfig>``
(``provekit/common/src/skyscraper/whir.rs:28-111``): leaf digest = left-fold
of 2-to-1 compress over the leaf's field elements (``SkyscraperCRH``), inner
nodes = ``compress(l, r)``, digests are field-native.  Every tree level is one
batched ``compress_v`` call across all nodes (the reference hashes serially
inside ark).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import vector as V
from ..hash import skyscraper as S


@dataclass
class MerkleTree:
    """levels[0] = leaf digests (16, n), levels[-1] = root (16, 1)."""
    levels: list

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[1]

    @property
    def depth(self) -> int:
        return len(self.levels) - 1

    def root(self) -> int:
        return V.unpack_scalar(self.levels[-1][:, 0])

    def open(self, indices: list[int],
             pad_to: int | None = None) -> list[list[int]]:
        """Auth path per index: sibling digests bottom-up (host ints).

        All sibling digests are gathered into ONE device array and fetched
        with a single transfer (per-scalar fetches cost a transport
        round-trip each on remote devices).  ``pad_to`` fixes the gather
        width: query counts are data-dependent (dedup of STIR indices), and
        without padding every prove compiles fresh gather executables.
        """
        depth = self.depth
        if not indices or depth == 0:
            return [[] for _ in indices]
        q = len(indices)
        padded = list(indices)
        if pad_to is not None and pad_to > q:
            padded += [indices[0]] * (pad_to - q)
        width = len(padded)
        gathered = []
        cur = padded
        for level in self.levels[:-1]:
            sibs = jnp.asarray([i ^ 1 for i in cur], dtype=jnp.int32)
            gathered.append(level[:, sibs])
            cur = [i >> 1 for i in cur]
        flat = V.unpack(jnp.concatenate(gathered, axis=1))
        return [[flat[d * width + j] for d in range(depth)]
                for j in range(q)]


def hash_leaves(leaves: jax.Array) -> jax.Array:
    """(16, leaf_size, n) -> (16, n) leaf digests (left-fold compress)."""
    from . import pallas_kernels as PK
    if leaves.shape[1] == 1:
        return leaves[:, 0, :]
    return _hash_leaves_jit(leaves, PK._pallas_enabled()
                            and leaves.shape[2] >= 4096
                            and (leaves.shape[2] & (leaves.shape[2] - 1)) == 0)


@functools.partial(jax.jit, static_argnums=(1,))
def _hash_leaves_jit(leaves: jax.Array, use_pallas: bool) -> jax.Array:
    from . import pallas_kernels as PK
    cmp = PK.compress_pallas if use_pallas else S.compress_v

    def body(i, h):
        return cmp(h, leaves[:, i, :])

    return jax.lax.fori_loop(1, leaves.shape[1], body, leaves[:, 0, :])


DEVICE_LEVEL_MIN = 256  # levels smaller than this hash on the host (native/C++)


def _host_levels(first: list[int]) -> list[list[int]]:
    from .. import native
    use_native = native.available()
    levels = [first]
    while len(levels[-1]) > 1:
        cur = levels[-1]
        if use_native:
            nxt = [native.compress(cur[i], cur[i + 1])
                   for i in range(0, len(cur), 2)]
        else:
            nxt = [S.compress(cur[i], cur[i + 1])
                   for i in range(0, len(cur), 2)]
        levels.append(nxt)
    return levels


def commit(leaves: jax.Array) -> MerkleTree:
    """Build the full tree from (16, leaf_size, n_leaves); n_leaves = 2^k.

    Large levels hash on-device (one batched compress per level); small
    levels fall back to the native host kernel — avoids compiling a device
    kernel per tail shape and is faster at those sizes anyway.
    """
    n_leaves = leaves.shape[2]
    if n_leaves <= DEVICE_LEVEL_MIN:
        # whole tree on the host (native C++ when available): avoids one
        # device compile per tree geometry for small trees
        from .. import native
        vals = V.unpack(leaves.reshape(16, -1))  # (leaf, n) flattened
        leaf_size = leaves.shape[1]
        cmp = native.compress if native.available() else S.compress
        digests = []
        for j in range(n_leaves):
            h = vals[j]
            for i in range(1, leaf_size):
                h = cmp(h, vals[i * n_leaves + j])
            digests.append(h)
        host = _host_levels(digests)
        return MerkleTree([V.pack(lv) for lv in host])
    from . import pallas_kernels as PK
    digests = hash_leaves(leaves)
    levels = [digests]
    while levels[-1].shape[1] > max(1, DEVICE_LEVEL_MIN):
        cur = levels[-1]
        levels.append(PK.compress_dispatch(cur[:, 0::2], cur[:, 1::2]))
    if levels[-1].shape[1] > 1:
        host = _host_levels(V.unpack(levels[-1]))
        levels.extend(V.pack(lv) for lv in host[1:])
    return MerkleTree(levels)


def root_dev(tree: MerkleTree) -> jax.Array:
    """Root digest as a (16, 1) canonical device array (no sync)."""
    return tree.levels[-1][:, :1]


def commit_dev(leaves: jax.Array) -> MerkleTree:
    """Fully device-resident tree build (no host levels, no syncs).

    Used by the device-resident prover: small-level compresses are tiny
    async dispatches, which beats a ~30 ms transfer round trip per tree on
    tunneled devices.

    Under an active mesh with enough leaves per shard, each shard hashes
    its contiguous leaf block into a subtree with ``shard_map`` and only
    the per-shard roots are all-gathered — the leaf matrices (the
    largest-memory arrays of a prove) are never materialized per device.
    Tiny mesh trees fall back to a replicated build.
    """
    from .. import config
    if (config.CHEAP_SYNC and leaves.shape[2] <= DEVICE_LEVEL_MIN
            and not isinstance(leaves, jax.core.Tracer)):
        return commit(leaves)  # host build (native C++), device-array levels
    from ..parallel import context as pctx
    mesh = pctx.active_mesh()
    if mesh is not None:
        s = int(mesh.devices.size)
        if s > 1 and leaves.shape[2] % s == 0 and leaves.shape[2] // s >= 2:
            return _commit_sharded(mesh, leaves)
        leaves = pctx.replicate(leaves)
    from . import pallas_kernels as PK
    digests = hash_leaves(leaves)
    levels = [digests]
    while levels[-1].shape[1] > 1:
        cur = levels[-1]
        levels.append(PK.compress_dispatch(cur[:, 0::2], cur[:, 1::2]))
    return MerkleTree(levels)


def _commit_sharded(mesh, leaves: jax.Array) -> MerkleTree:
    """Per-shard subtree build + all_gather of the S per-shard roots.

    Leaves are sharded in contiguous blocks over the mesh's single axis, so
    global node j of level l lives on shard ``j // (per_shard / 2^l)`` —
    exactly a last-axis NamedSharding of the global level array, which is
    what ``shard_map`` emits.  Levels at and above the per-shard roots are
    replicated (log2(S) tiny arrays).  Same compress math as the replicated
    build — roots are bit-identical.
    """
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..hash import skyscraper as S_
    from ..parallel import context as pctx
    from ..parallel.mesh import shard_map

    s = int(mesh.devices.size)
    leaf_size = leaves.shape[1]
    n = leaves.shape[2]
    per = n // s
    local_levels = per.bit_length() - 1  # levels 0..local_levels-1 sharded
    x = jax.device_put(leaves.reshape(16, leaf_size, s, per),
                       NamedSharding(mesh, P(None, None, "shards", None)))

    out_specs = tuple(P(None, "shards") for _ in range(local_levels)) \
        + (P(None, None),)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(None, None, "shards", None),),
                       out_specs=out_specs)
    def run(lv):
        # per-shard local compute: Pallas kernels legal again (shard_body)
        from . import pallas_kernels as PK
        with pctx.shard_body():
            local = lv.reshape(16, leaf_size, per)
            use_pallas = (PK._pallas_enabled() and per >= 4096
                          and (per & (per - 1)) == 0)
            h = (_hash_leaves_jit(local, use_pallas) if leaf_size > 1
                 else local[:, 0])
            outs = [h]
            while outs[-1].shape[1] > 1:
                cur = outs[-1]
                outs.append(PK.compress_dispatch(cur[:, 0::2], cur[:, 1::2]))
            tops = jax.lax.all_gather(outs[-1][:, 0], "shards",
                                      axis=1)  # (16, S)
        from ..parallel.mesh import _prove_replicated
        return tuple(outs[:-1]) + (_prove_replicated(tops),)

    *sharded, tops = run(x)
    levels = list(sharded) + [tops]
    while levels[-1].shape[1] > 1:
        cur = levels[-1]
        levels.append(S_.compress_v(cur[:, 0::2], cur[:, 1::2]))
    return MerkleTree(levels)


def open_gather_dev(tree: MerkleTree, indices: jax.Array) -> jax.Array:
    """Auth paths for (q,) uint32 leaf indices as (16, depth*q) digests.

    Sibling digests bottom-up, row-major by level (level d occupies columns
    [d*q, (d+1)*q)) — matches ``MerkleTree.open``'s flat gather layout."""
    from .. import config
    if (config.CHEAP_SYNC and not isinstance(indices, jax.core.Tracer)
            and tree.num_leaves <= DEVICE_LEVEL_MIN):
        idx = np.asarray(jax.device_get(indices)).astype(np.int64)
        blocks = []
        cur = idx
        for level in tree.levels[:-1]:
            lv = np.asarray(jax.device_get(level))
            blocks.append(lv[:, cur ^ 1])
            cur = cur >> 1
        if not blocks:
            return jnp.zeros((16, 0), dtype=jnp.uint32)
        return jnp.asarray(np.concatenate(blocks, axis=1))
    if len(tree.levels) <= 1:
        return jnp.zeros((16, 0), dtype=jnp.uint32)
    # one jitted program for all levels: ~depth separate gather dispatches
    # otherwise, each paying the per-dispatch floor (~1.8 ms tunneled)
    return _open_gather_jit(tuple(tree.levels[:-1]), indices)


@jax.jit
def _open_gather_jit(levels: tuple, indices: jax.Array) -> jax.Array:
    gathered = []
    cur = indices
    for level in levels:
        gathered.append(level[:, cur ^ jnp.uint32(1)])
        cur = cur >> 1
    return jnp.concatenate(gathered, axis=1)


def verify_path(root: int, leaf_values: list[int], index: int,
                path: list[int]) -> bool:
    """Host-side path check: hash leaf values, then climb with siblings.

    Uses the native C++ compress when built (one Skyscraper permutation per
    node dominates verify wall-clock otherwise).
    """
    from .. import native
    if native.available():
        return native.merkle_verify(leaf_values, path, index, root)
    h = leaf_values[0]
    for v in leaf_values[1:]:
        h = S.compress(h, v)
    i = index
    for sib in path:
        h = S.compress(h, sib) if i % 2 == 0 else S.compress(sib, h)
        i >>= 1
    return h == root
