"""WHIR batch commitment: RS-encode, fold-ordered Merkle leaves, OOD samples.

Replaces ``whir::whir::committer::CommitmentWriter::commit_batch`` as used by
``batch_commit_to_polynomial`` (reference prover/src/whir_r1cs.rs:182-209).

Leaf layout: the oracle over domain N (generator w) is stored so that leaf
``j`` holds the ``2^ff`` evaluations {f(w^(j + t*N/2^ff))}, i.e. exactly the
coset that folds to one point of the next domain; a batch of k polynomials
concatenates per-poly groups (k * 2^ff field elements per leaf).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..ops import merkle, ntt
from ..ops import sumcheck as sc
from .parameters import WhirConfig
from .statement import univariate_to_multilinear_point


def fold_leaves_view(enc: jax.Array, fold_size: int) -> jax.Array:
    """(16, N) encoding -> (16, fold_size, N/fold_size) leaf view."""
    n = enc.shape[1]
    return enc.reshape(16, fold_size, n // fold_size)


@dataclass
class ProverCommitment:
    config: WhirConfig
    polys: list            # k original (16, 2^m) evaluation arrays
    combined: jax.Array    # (16, 2^m) gamma-combined evaluations
    encoding: jax.Array    # (16, k, N) per-poly RS encodings
    tree: merkle.MerkleTree
    root: int
    ood_points: list[int]
    ood_answers: list[list[int]]  # [point][poly]
    batching_randomness: int

    def combined_ood_answers(self) -> list[int]:
        out = []
        for answers in self.ood_answers:
            acc, g = 0, 1
            for a in answers:
                acc = (acc + g * a) % F.P
                g = g * self.batching_randomness % F.P
            out.append(acc)
        return out


def commit_pattern(ds, config: WhirConfig, label: str = "") -> None:
    """Transcript shape of a (batch) commitment (commit_statement)."""
    ds.absorb(1, f"merkle_root{label}")
    if config.commitment_ood_samples:
        ds.squeeze(config.commitment_ood_samples, f"ood_query{label}")
        ds.absorb(config.commitment_ood_samples * config.batch_size,
                  f"ood_answers{label}")
    if config.batch_size > 1:
        ds.squeeze(1, f"batching_randomness{label}")


def commit(transcript, config: WhirConfig, polys: list) -> ProverCommitment:
    """Commit a batch of multilinear polys given by hypercube evaluations."""
    from ..utils.profiling import span
    assert len(polys) == config.batch_size
    m = config.num_variables
    fold_size = 1 << config.initial_folding_factor

    with span(f"rs_encode_m{m}"):
        encs = []
        for evals in polys:
            assert evals.shape == (16, 1 << m)
            coeffs = ntt.coeffs_of_evals(evals)
            encs.append(ntt.rs_encode(coeffs, config.starting_log_domain))
        encoding = jnp.stack(encs, axis=1)  # (16, k, N)

    n = encoding.shape[2]
    # leaf j element (i, t) = enc_i[j + t*N/fold]
    leaves = encoding.reshape(16, len(polys), fold_size, n // fold_size)
    leaves = leaves.reshape(16, len(polys) * fold_size, n // fold_size)
    # Skyscraper hashes canonical values (reference whir.rs:20-26 into_bigint)
    with span(f"merkle_m{m}"):
        tree = merkle.commit(V.from_mont(leaves))
    root = tree.root()
    transcript.add_scalars([root])

    ood_points, ood_answers = [], []
    if config.commitment_ood_samples:
        ood_points = transcript.challenge_scalars(config.commitment_ood_samples)
        coords_list = [univariate_to_multilinear_point(z, m)
                       for z in ood_points]
        per_poly = [sc.eval_multilinear_batch(ev, coords_list)
                    for ev in polys]
        flat = []
        for i in range(len(ood_points)):
            answers = [per_poly[k][i] for k in range(len(polys))]
            ood_answers.append(answers)
            flat.extend(answers)
        transcript.add_scalars(flat)

    gamma = 1
    if config.batch_size > 1:
        gamma = transcript.challenge_scalars(1)[0]

    combined = polys[0]
    g = gamma
    for ev in polys[1:]:
        gb = V.broadcast_scalar(V.pack_scalar(F.to_mont(g)), ev.shape[1:])
        combined = V.add_mod(combined, V.mont_mul(gb, ev))
        g = g * gamma % F.P

    return ProverCommitment(
        config=config, polys=polys, combined=combined, encoding=encoding,
        tree=tree, root=root, ood_points=ood_points, ood_answers=ood_answers,
        batching_randomness=gamma)
