"""Multi-chip sharding: sumcheck, NTT, Merkle and PoW across a device mesh.

TPU-native scaling design (reference is single-process rayon only —
SURVEY.md §2.10): polynomial/constraint arrays are sharded over a 1-D
``shards`` mesh axis with ``shard_map``; XLA collectives do the exchanges:

* Spartan sumcheck: arrays live in *cyclic* layout (global index =
  local * S + shard), which makes the MSB-pairing round window and the
  eq-table doubling shard-local; only the three round sums cross chips
  (limb-plane ``psum``).
* WHIR sumcheck: arrays live in *contiguous* layout, making the LSB-pairing
  fold local; round sums via ``psum``.
* NTT: four-step decomposition n = A x B — local NTT_B, twiddle,
  ``all_to_all`` reshard (the butterfly transpose over ICI), local NTT_A.
* Merkle: each shard hashes its subtree; the top log2(S) levels are
  all-gathered (tiny) and finished locally.
* PoW: nonce ranges striped across shards, ``pmin`` on success.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map as _shard_map


import os

_SHARD_CHECKS = os.environ.get("PROVEKIT_TPU_SHARD_CHECKS", "1") not in (
    "0", "false", "")


def shard_map(*args, **kwargs):
    """shard_map, replication checking controlled by
    PROVEKIT_TPU_SHARD_CHECKS (default ON since round 4).

    With checks on, the varying-manual-axes checker validates every
    replicated (``P(None)``) output — psum/all_gather results are tracked
    through the limb-plane arithmetic.  The escape hatch exists for JAX
    versions whose checker cannot see through a pattern we use; flipping it
    off changes no computed bytes (tests/test_sharding.py pins bit-equality
    against single-device kernels either way)."""
    if _SHARD_CHECKS:
        return _shard_map(*args, **kwargs)
    try:
        return _shard_map(*args, check_vma=False, **kwargs)
    except TypeError:
        return _shard_map(*args, check_rep=False, **kwargs)

from . import context as pctx
from ..fields import bn254 as F
from ..fields import vector as V
from ..fields.wide import reduce_wide
from ..ops import sumcheck as sc
from ..ops import ntt as ntt_mod


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), axis_names=("shards",))


def _prove_replicated(x, axis_name: str = "shards"):
    """Make an identical-on-all-shards value PROVABLY replicated.

    ``all_gather`` results are identical across shards but the vma checker
    cannot infer that, so replicated (``P(None)``) out_specs are rejected.
    The shard-0 mask means exactly one shard contributes to the psum, so
    the sum is a bit-exact broadcast of shard 0's value for ANY element
    type or magnitude, and IS tracked as replicated.  Precondition: x must
    already be identical on all shards — otherwise every shard silently
    receives shard 0's copy.  Cost: one tiny collective on a digest-sized
    array.
    """
    me = jax.lax.axis_index(axis_name)
    return jax.lax.psum(jnp.where(me == 0, x, jnp.zeros_like(x)), axis_name)


def _psum_mod(x16, axis_name: str):
    """Modular cross-shard sum of per-shard (16,) Montgomery partials."""
    wide = jax.lax.psum(x16, axis_name)  # limbs < S * 2^16: fine for S <= 2^16
    return reduce_wide(wide.reshape(16, 1)).reshape(16)


def spartan_round_sharded(mesh: Mesh, a, b, c, eq):
    """Sharded Spartan round sums. Inputs (16, n) in cyclic layout:
    pass arrays already reshaped to (16, S, L) with axis 1 sharded."""
    spec = P(None, "shards", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,) * 4,
                       out_specs=(P(None),) * 3)
    def run(a, b, c, eq):
        with pctx.shard_body():
            a, b, c, eq = (x.reshape(16, -1) for x in (a, b, c, eq))
            f0, fm1, finf = sc.spartan_round(a, b, c, eq)
            return (_psum_mod(f0, "shards"), _psum_mod(fm1, "shards"),
                    _psum_mod(finf, "shards"))

    return run(a, b, c, eq)


def fold_msb_sharded(mesh: Mesh, x, alpha):
    """MSB fold on cyclic-layout (16, S, L) sharded arrays — fully local."""
    spec = P(None, "shards", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, P(None)),
                       out_specs=spec)
    def run(x, alpha):
        with pctx.shard_body():
            local = x.reshape(16, -1)
            return sc.fold(local, alpha).reshape(16, 1, -1)

    return run(x, alpha)


def whir_round_sharded(mesh: Mesh, f, w):
    """WHIR round sums on contiguous-layout (16, S, L) sharded arrays."""
    spec = P(None, "shards", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec),
                       out_specs=(P(None),) * 3)
    def run(f, w):
        with pctx.shard_body():
            f, w = f.reshape(16, -1), w.reshape(16, -1)
            h0, h1, h2 = sc.whir_round(f, w)
            return (_psum_mod(h0, "shards"), _psum_mod(h1, "shards"),
                    _psum_mod(h2, "shards"))

    return run(f, w)


def fold_lsb_sharded(mesh: Mesh, x, alpha):
    """LSB fold on contiguous-layout sharded arrays — fully local."""
    spec = P(None, "shards", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, P(None)),
                       out_specs=spec)
    def run(x, alpha):
        with pctx.shard_body():
            local = x.reshape(16, -1)
            return sc.fold_lsb(local, alpha).reshape(16, 1, -1)

    return run(x, alpha)


# ---------------------------------------------------------------------------
# Distributed NTT (four-step)


def ntt_sharded(mesh: Mesh, x, log_n: int):
    """Distributed NTT: local stages + all_to_all transpose + local stages.

    Simpler formulation: NTT_n(c)[k] with n = A*B, k = k2*A + k1,
    j = j1*B + j2:  X[k2*A + k1] =
        sum_{j2} W_B^{k2 j2} * ( W_n^{k1 j2} * sum_{j1} W_A^{k1 j1} c[j1*B + j2] )
    Step 1 (local after transpose): NTT_A over j1 for each j2.
    Step 2: twiddle W_n^(k1 j2).  Step 3: NTT_B over j2 for each k1.
    Sharding: j1 blocks = contiguous rows; transposes via all_to_all.
    """
    s = int(mesh.devices.size)
    n = 1 << log_n
    log_s = s.bit_length() - 1
    a_dim, b_dim = s, n // s

    # Pre-compute twiddles W_n^(k1*j2): shape (A, B) sharded over k1 rows.
    w = F.root_of_unity(log_n)
    tw_rows = []
    for k1 in range(a_dim):
        base = pow(w, k1, F.P)
        acc, row = 1, []
        for _ in range(b_dim):
            row.append(F.to_mont(acc))
            acc = acc * base % F.P
        tw_rows.append(row)
    tw = V.pack([v for row in tw_rows for v in row]).reshape(16, a_dim, b_dim)

    spec = P(None, "shards", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec),
                       out_specs=spec)
    def run(x, tw):
        with pctx.shard_body():
            return _run_body(x, tw)

    def _run_body(x, tw):
        # local x: (16, 1, B) = c[a*B : (a+1)*B] (contiguous row a = j1)
        # Transpose to gather j1 axis locally: all_to_all over sub-chunks.
        sub = x.reshape(16, s, b_dim // s)  # axis1 = destination shard t
        sub = jax.lax.all_to_all(sub, "shards", split_axis=1, concat_axis=1)
        # now axis1 = original shard j1, local owns j2 in [my*(B/S), ...)
        # Step 1: NTT_A over j1 (axis 1) for each local j2
        outs = []
        for u in range(b_dim // s):
            outs.append(ntt_mod._ntt_core(sub[:, :, u], log_s, False))
        step1 = jnp.stack(outs, axis=2)  # (16, A(k1), B/S(j2 local))
        # Transpose back: send k1 block to shard k1
        back = jax.lax.all_to_all(step1, "shards", split_axis=1, concat_axis=1)
        # now local: (16, S(source=j2 group), B/S) for my k1 row:
        # reassemble j2 axis: source t owned j2 = t*(B/S)+u
        mine = back.reshape(16, 1, b_dim)  # j2 contiguous
        # Step 2: twiddle W_n^(k1 * j2)
        mine = V.mont_mul(mine.reshape(16, b_dim),
                          tw.reshape(16, b_dim))
        # Step 3: NTT_B over j2 (local, contiguous)
        log_b = b_dim.bit_length() - 1
        out = ntt_mod._ntt_core(mine, log_b, False)
        # output index k = k2*A + k1: shard k1 holds all k2 — the natural-
        # order result is the (k1, k2) "bit-transposed" layout.
        return out.reshape(16, 1, b_dim)

    return run(x, tw)


def merkle_root_sharded(mesh: Mesh, leaves):
    """Sharded Merkle: (16, leaf, S, n/S) -> root digest (16,) canonical.

    Each shard folds and hashes its subtree; top levels all-gathered.
    """
    from ..ops import merkle
    spec = P(None, None, "shards", None)
    s = int(mesh.devices.size)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=P(None))
    def run(leaves):
        with pctx.shard_body():
            return _run_body(leaves)

    def _run_body(leaves):
        local = leaves.reshape(16, leaves.shape[1], -1)
        tree = _local_subtree_root(local)
        roots = jax.lax.all_gather(tree, "shards", axis=1)  # (16, S)
        while roots.shape[1] > 1:
            from ..hash import skyscraper as S_
            roots = S_.compress_v(roots[:, 0::2], roots[:, 1::2])
        return _prove_replicated(roots.reshape(16))

    def _local_subtree_root(local):
        from ..ops import merkle as merkle_mod
        from ..ops import pallas_kernels as PK
        h = merkle_mod.hash_leaves(local)
        while h.shape[1] > 1:
            h = PK.compress_dispatch(h[:, 0::2], h[:, 1::2])
        return h

    return run(leaves)
