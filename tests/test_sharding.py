"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Each sharded kernel must bit-match its single-device counterpart.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.fields import vector as V
from provekit_tpu.ops import merkle, ntt
from provekit_tpu.ops import sumcheck as sc
from provekit_tpu import parallel as pp


def mont_pack(xs):
    return V.pack([F.to_mont(x) for x in xs])


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return pp.make_mesh(8)


def to_cyclic(x, s):
    n = x.shape[1]
    return x.reshape(16, n // s, s).transpose(0, 2, 1)


def to_contig(x, s):
    return x.reshape(16, s, x.shape[1] // s)


def test_spartan_round_sharded(mesh):
    rng = random.Random(1)
    n, s = 64, 8
    arrs = [mont_pack([rng.randrange(F.P) for _ in range(n)])
            for _ in range(4)]
    want = sc.spartan_round(*arrs)
    got = pp.spartan_round_sharded(mesh, *[to_cyclic(x, s) for x in arrs])
    for w, g in zip(want, got):
        assert V.unpack_scalar(w) == V.unpack_scalar(g)


def test_fold_msb_sharded(mesh):
    rng = random.Random(2)
    n, s = 64, 8
    x = mont_pack([rng.randrange(F.P) for _ in range(n)])
    alpha = V.pack_scalar(F.to_mont(rng.randrange(F.P)))
    want = sc.fold(x, alpha)
    got = pp.fold_msb_sharded(mesh, to_cyclic(x, s), alpha)
    # got is cyclic (16, S, L/2) -> back to natural
    got_nat = got.transpose(0, 2, 1).reshape(16, n // 2)
    assert V.unpack(got_nat) == V.unpack(want)


def test_whir_round_and_fold_sharded(mesh):
    rng = random.Random(3)
    n, s = 64, 8
    f = mont_pack([rng.randrange(F.P) for _ in range(n)])
    w = mont_pack([rng.randrange(F.P) for _ in range(n)])
    want = sc.whir_round(f, w)
    got = pp.whir_round_sharded(mesh, to_contig(f, s), to_contig(w, s))
    for a, b in zip(want, got):
        assert V.unpack_scalar(a) == V.unpack_scalar(b)

    alpha = V.pack_scalar(F.to_mont(rng.randrange(F.P)))
    want_f = sc.fold_lsb(f, alpha)
    got_f = pp.fold_lsb_sharded(mesh, to_contig(f, s), alpha)
    assert V.unpack(got_f.reshape(16, n // 2)) == V.unpack(want_f)


def test_ntt_sharded(mesh):
    rng = random.Random(4)
    log_n, s = 9, 8
    n = 1 << log_n
    coeffs = [rng.randrange(F.P) for _ in range(n)]
    x = mont_pack(coeffs)
    ref = V.unpack(ntt.ntt(x))
    got = pp.ntt_sharded(mesh, to_contig(x, s), log_n)
    got_flat = V.unpack(got.reshape(16, n))
    a_dim, b_dim = s, n // s
    for k in range(0, n, 37):
        k1, k2 = k % a_dim, k // a_dim
        assert got_flat[k1 * b_dim + k2] == ref[k], k


def test_merkle_root_sharded(mesh):
    rng = random.Random(5)
    leaf, n, s = 4, 32, 8
    vals = [rng.randrange(F.P) for _ in range(leaf * n)]
    leaves = V.pack(vals).reshape(16, leaf, n)
    want = merkle.commit(leaves).root()
    shard_view = leaves.reshape(16, leaf, s, n // s)
    got = pp.merkle_root_sharded(mesh, shard_view)
    assert V.unpack_scalar(got) == want


def _commit_sharded_case(mesh, log_n: int, leaf: int, seed: int):
    """commit_dev under a mesh must equal the replicated build: root, level
    shapes, and opened auth paths (the prover gathers paths from the
    sharded levels)."""
    from provekit_tpu.parallel import context as pctx
    rng = random.Random(seed)
    n = 1 << log_n
    vals = [rng.randrange(F.P) for _ in range(leaf * n)]
    leaves = V.pack(vals).reshape(16, leaf, n)
    want_tree = merkle.commit_dev(leaves)
    with pctx.use_mesh(mesh):
        got_tree = merkle.commit_dev(leaves)
    assert got_tree.root() == want_tree.root()
    assert [lv.shape for lv in got_tree.levels] == \
        [lv.shape for lv in want_tree.levels]
    idx = jnp.asarray(sorted(rng.sample(range(n), 4)), dtype=jnp.uint32)
    want_paths = V.unpack(merkle.open_gather_dev(want_tree, idx))
    with pctx.use_mesh(mesh):
        got_paths = V.unpack(merkle.open_gather_dev(got_tree, idx))
    assert got_paths == want_paths


def test_commit_dev_sharded_subtrees(mesh):
    _commit_sharded_case(mesh, log_n=9, leaf=4, seed=6)


@pytest.mark.slow
def test_commit_dev_sharded_subtrees_64k(mesh):
    # device-engaging size (round-3 verdict item 9): 2^16 leaves
    _commit_sharded_case(mesh, log_n=16, leaf=2, seed=7)


# --- device-engaging sizes (round-3 verdict item 9: >= 2^16 elements) ------


@pytest.mark.slow
def test_spartan_round_sharded_64k(mesh):
    rng = random.Random(8)
    n, s = 1 << 16, 8
    arrs = [mont_pack([rng.randrange(F.P) for _ in range(n)])
            for _ in range(4)]
    want = sc.spartan_round(*arrs)
    got = pp.spartan_round_sharded(mesh, *[to_cyclic(x, s) for x in arrs])
    for w, g in zip(want, got):
        assert V.unpack_scalar(w) == V.unpack_scalar(g)


@pytest.mark.slow
def test_whir_round_and_fold_sharded_64k(mesh):
    rng = random.Random(9)
    n, s = 1 << 16, 8
    f = mont_pack([rng.randrange(F.P) for _ in range(n)])
    w = mont_pack([rng.randrange(F.P) for _ in range(n)])
    want = sc.whir_round(f, w)
    got = pp.whir_round_sharded(mesh, to_contig(f, s), to_contig(w, s))
    for a, b in zip(want, got):
        assert V.unpack_scalar(a) == V.unpack_scalar(b)

    alpha = V.pack_scalar(F.to_mont(rng.randrange(F.P)))
    want_f = sc.fold_lsb(f, alpha)
    got_f = pp.fold_lsb_sharded(mesh, to_contig(f, s), alpha)
    # limb arithmetic is exact uint32: array equality == value equality
    assert np.array_equal(np.asarray(got_f.reshape(16, n // 2)),
                          np.asarray(want_f))


@pytest.mark.slow
def test_ntt_sharded_64k(mesh):
    rng = random.Random(10)
    log_n, s = 16, 8
    n = 1 << log_n
    x = mont_pack([rng.randrange(F.P) for _ in range(n)])
    ref = np.asarray(ntt.ntt(x))
    got = np.asarray(pp.ntt_sharded(mesh, to_contig(x, s), log_n)
                     ).reshape(16, n)
    a_dim, b_dim = s, n // s
    # natural index k lives at sharded position k1*B + k2 (k = k2*A + k1)
    k = np.arange(n)
    perm = (k % a_dim) * b_dim + k // a_dim
    assert np.array_equal(got[:, perm], ref)
