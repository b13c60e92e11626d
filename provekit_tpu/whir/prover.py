"""WHIR opening prover: initial sumcheck, folding rounds, STIR queries, final.

Replaces ``whir::whir::prover::Prover::prove`` (used by
``run_zk_whir_pcs_prover``, reference prover/src/whir_r1cs.rs:414-437).
Protocol flow mirrors the in-repo gnark verifier
(recursive-verifier/app/circuit/whir.go:51-220), which is the reference's
own bit-level description of the WHIR transcript.

All heavy work is batched device compute: folds, round sums, wavelet + NTT
re-encodings, Merkle layers.  Host code only sequences the sponge.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..ops import merkle, ntt
from ..ops import pow as pow_mod
from ..ops import sumcheck as sc
from .committer import ProverCommitment, fold_leaves_view
from .hints import serialize_openings
from .parameters import WhirConfig
from .statement import Statement, univariate_to_multilinear_point


def proof_pattern(ds, config: WhirConfig, label: str = "") -> None:
    """Transcript shape of a WHIR opening proof (add_whir_proof)."""
    ds.squeeze(1, f"initial_combination_randomness{label}")
    for _ in range(config.initial_folding_factor):
        ds.absorb(3, "sumcheck_poly").squeeze(1, "folding_randomness")
    for rc in config.rounds:
        ds.absorb(1, "merkle_root")
        if rc.ood_samples:
            ds.squeeze(rc.ood_samples, "ood_query")
            ds.absorb(rc.ood_samples, "ood_answers")
        if rc.pow_bits > 0:
            ds.squeeze(1, "pow_challenge").absorb(1, "pow_nonce")
        ds.squeeze(rc.num_queries, "stir_queries")
        ds.hint("stir_answers")
        ds.squeeze(1, "combination_randomness")
        for _ in range(rc.folding_factor):
            ds.absorb(3, "sumcheck_poly").squeeze(1, "folding_randomness")
    ds.absorb(1 << config.final_sumcheck_rounds, "final_coefficients")
    if config.final_pow_bits > 0:
        ds.squeeze(1, "pow_challenge").absorb(1, "pow_nonce")
    ds.squeeze(config.final_queries, "final_queries")
    ds.hint("final_answers")
    for _ in range(config.final_sumcheck_rounds):
        ds.absorb(3, "sumcheck_poly").squeeze(1, "folding_randomness")
    if config.final_folding_pow_bits > 0:
        ds.squeeze(1, "pow_challenge").absorb(1, "pow_nonce")


@dataclass
class ProveOutput:
    binders: list[int]          # all folding randomness, in drawing order
    final_coeffs: list[int]


def _stir_indices(transcript, num_queries: int, folded_domain: int) -> list[int]:
    """Squeeze query scalars and map to sorted, deduplicated leaf indices."""
    scalars = transcript.challenge_scalars(num_queries)
    return sorted({s % folded_domain for s in scalars})


def _open_oracle(encoding, tree: merkle.MerkleTree, indices: list[int],
                 fold_size: int, pad_to: int | None = None):
    """Leaf values (per index, poly-major x t-minor) + auth paths.

    ``pad_to`` pins the gather width to the protocol's query count so the
    device executables stay shape-stable across proves (the dedup'd index
    count is data-dependent).
    """
    view = encoding.reshape(16, -1)  # (16, k*N)
    k = encoding.shape[1]
    n = encoding.shape[2]
    per_leaf = n // fold_size
    padded = list(indices)
    if pad_to is not None and pad_to > len(indices):
        padded += [indices[0]] * (pad_to - len(indices))
    flat = []
    for idx in padded:
        for i in range(k):
            for t in range(fold_size):
                flat.append(i * n + t * per_leaf + idx)
    got = V.unpack(view[:, jnp.asarray(flat, dtype=jnp.int32)])
    leaf_elems = k * fold_size
    leaf_values = [[F.from_mont(v)
                    for v in got[i * leaf_elems:(i + 1) * leaf_elems]]
                   for i in range(len(indices))]
    paths = tree.open(indices, pad_to=pad_to)
    return leaf_values, paths


def _send_pow(transcript, bits: float) -> None:
    ch = transcript.challenge_scalars(1)[0]
    nonce = pow_mod.solve(ch, bits)
    transcript.add_scalars([nonce])


def prove(transcript, config: WhirConfig, commitment: ProverCommitment,
          statement: Statement) -> ProveOutput:
    m = config.num_variables
    iff = config.initial_folding_factor
    fold_size = 1 << iff

    # --- initial claim + weight combination -------------------------------
    chat = transcript.challenge_scalars(1)[0]
    ood_answers = commitment.combined_ood_answers()
    values = ood_answers + [sigma for _, sigma in statement.constraints]
    claim, g = 0, 1
    powers = []
    for v in values:
        powers.append(g)
        claim = (claim + g * v) % F.P
        g = g * chat % F.P

    n_ood = len(commitment.ood_points)
    if n_ood:
        ood_coords = [univariate_to_multilinear_point(z, m)
                      for z in commitment.ood_points]
        w = sc.combine_eq_weights(ood_coords, powers[:n_ood], m)
    else:
        w = V.zeros((1 << m,))
    for coeff, (wt, _) in zip(powers[n_ood:], statement.constraints):
        table = wt.table()
        cb = V.broadcast_scalar(V.pack_scalar(F.to_mont(coeff)), table.shape[1:])
        w = V.add_mod(w, V.mont_mul(cb, table))

    fw = jnp.stack([commitment.combined, w], axis=1)  # (16, 2, 2^m)
    binders: list[int] = []

    def sumcheck_rounds(fw, claim, count):
        if count == 0:
            return fw, claim
        if fw.shape[2] > sc.HOST_TAIL:
            # fused: all rounds + the sponge advance in ONE device dispatch;
            # the host replays the coefficients to stay authoritative.
            from ..ops import fused
            st = transcript.sponge_state_array()
            n_in = fw.shape[2]
            fw_full, _, coeffs_arr = fused.whir_sumcheck_segment(fw, st, count)
            fw = fw_full[:, :, :n_in >> count]
            vals = V.unpack(coeffs_arr.reshape(16, count * 3))
            for i in range(count):
                coeffs = vals[3 * i:3 * i + 3]
                transcript.add_scalars(coeffs)
                alpha = transcript.challenge_scalars(1)[0]
                binders.append(alpha)
                claim = sc.eval_cubic(coeffs, alpha)
            return fw, claim
        # host tail: ONE transfer in, all rounds in host ints, one out
        # (per-round device syncs are round-trip-bound on remote devices)
        n = fw.shape[2]
        xs = [F.from_mont(v) for v in V.unpack(fw.reshape(16, 2 * n))]
        fv, wv = xs[:n], xs[n:]
        for _ in range(count):
            h0 = h1 = h2 = 0
            for i in range(len(fv) // 2):
                f0, f1 = fv[2 * i], fv[2 * i + 1]
                w0, w1 = wv[2 * i], wv[2 * i + 1]
                df, dw = f1 - f0, w1 - w0
                h0 += f0 * w0
                h1 += f0 * dw + w0 * df
                h2 += df * dw
            coeffs = [h0 % F.P, h1 % F.P, h2 % F.P]
            transcript.add_scalars(coeffs)
            alpha = transcript.challenge_scalars(1)[0]
            binders.append(alpha)
            fv = [(fv[2 * i] + alpha * (fv[2 * i + 1] - fv[2 * i])) % F.P
                  for i in range(len(fv) // 2)]
            wv = [(wv[2 * i] + alpha * (wv[2 * i + 1] - wv[2 * i])) % F.P
                  for i in range(len(wv) // 2)]
            claim = sc.eval_cubic(coeffs, alpha)
        fw = V.pack([F.to_mont(x) for x in fv + wv]).reshape(16, 2, len(fv))
        return fw, claim

    from ..utils.profiling import span
    with span("initial_sumcheck"):
        fw, claim = sumcheck_rounds(fw, claim, iff)

    prev_encoding = commitment.encoding
    prev_tree = commitment.tree
    prev_log_domain = config.starting_log_domain
    prev_alphas = binders[-iff:]
    prev_fold_size = fold_size
    prev_batch = config.batch_size

    for r, rc in enumerate(config.rounds):
        from ..utils.profiling import span
        # commit f^(r+1)
        with span(f"round{r}_commit"):
            f = fw[:, 0]
            log_dom = config.starting_log_domain - (r + 1)
            coeffs_arr = ntt.coeffs_of_evals(f)
            enc = ntt.rs_encode(coeffs_arr, log_dom)
            rfold = 1 << rc.folding_factor
            leaves = fold_leaves_view(enc, rfold)
            tree = merkle.commit(V.from_mont(leaves))
            transcript.add_scalars([tree.root()])

        m_cur = m - iff - rc.folding_factor * r
        round_values, round_points = [], []
        if rc.ood_samples:
            oods = transcript.challenge_scalars(rc.ood_samples)
            answers = sc.eval_multilinear_batch(
                f, [univariate_to_multilinear_point(z, m_cur) for z in oods])
            transcript.add_scalars(answers)
            round_values.extend(answers)
            round_points.extend(oods)

        if rc.pow_bits > 0:
            with span(f"round{r}_pow"):
                _send_pow(transcript, rc.pow_bits)

        folded_domain = (1 << prev_log_domain) // prev_fold_size
        indices = _stir_indices(transcript, rc.num_queries, folded_domain)
        with span(f"round{r}_open"):
            leaf_values, paths = _open_oracle(prev_encoding, prev_tree,
                                              indices, prev_fold_size,
                                              pad_to=rc.num_queries)
            transcript.hint_bytes(
                serialize_openings(indices, leaf_values, paths))

        # fold values = evals of f^(r+1) at y^prev_fold for queried y
        omega_prev = F.root_of_unity(prev_log_domain)
        n_cur = 1 << log_dom
        enc_idx = [(prev_fold_size // 2) * idx % n_cur for idx in indices]
        enc_idx += [0] * (rc.num_queries - len(enc_idx))  # static gather width
        fold_vals = [F.from_mont(v) for v in V.unpack(
            enc[:, jnp.asarray(enc_idx, dtype=jnp.int32)])][:len(indices)]
        round_values.extend(fold_vals)
        round_points.extend(pow(omega_prev, prev_fold_size * idx, F.P)
                            for idx in indices)

        chat_r = transcript.challenge_scalars(1)[0]
        gpow = 1
        coeffs = []
        for v in round_values:
            claim = (claim + gpow * v) % F.P
            coeffs.append(gpow)
            gpow = gpow * chat_r % F.P
        coords = [univariate_to_multilinear_point(z, m_cur)
                  for z in round_points]
        with span(f"round{r}_weights"):
            w_add = sc.combine_eq_weights(coords, coeffs, m_cur)
            fw = _add_to_w(fw, w_add)

        with span(f"round{r}_sumcheck"):
            fw, claim = sumcheck_rounds(fw, claim, rc.folding_factor)

        prev_encoding = enc.reshape(16, 1, n_cur)
        prev_tree = tree
        prev_log_domain = log_dom
        prev_alphas = binders[-rc.folding_factor:]
        prev_fold_size = rfold
        prev_batch = 1

    # --- final phase ------------------------------------------------------
    final_coeffs_arr = ntt.coeffs_of_evals(fw[:, 0])
    final_coeffs = [F.from_mont(v) for v in V.unpack(final_coeffs_arr)]
    transcript.add_scalars(final_coeffs)

    if config.final_pow_bits > 0:
        _send_pow(transcript, config.final_pow_bits)

    folded_domain = (1 << prev_log_domain) // prev_fold_size
    indices = _stir_indices(transcript, config.final_queries, folded_domain)
    leaf_values, paths = _open_oracle(prev_encoding, prev_tree, indices,
                                      prev_fold_size,
                                      pad_to=config.final_queries)
    transcript.hint_bytes(serialize_openings(indices, leaf_values, paths))

    fw, claim = sumcheck_rounds(fw, claim, config.final_sumcheck_rounds)

    if config.final_folding_pow_bits > 0:
        _send_pow(transcript, config.final_folding_pow_bits)

    return ProveOutput(binders=binders, final_coeffs=final_coeffs)


@jax.jit
def _add_to_w(fw: jax.Array, w_add: jax.Array) -> jax.Array:
    """fw (16,2,n): add w_add (16,n) to the weight half in one dispatch."""
    import jax.numpy as _jnp
    from ..fields import vector as _V
    new_w = _V.add_mod(fw[:, 1], w_add)
    return _jnp.stack([fw[:, 0], new_w], axis=1)
