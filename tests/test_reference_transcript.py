"""Conformance against the reference's OWN Rust proof bytes.

The reference checks in the real proof its Rust prover produced for the
headline benchmark workload (poseidon2 + 1000 hash rounds):
``/root/reference/tooling/provekit-bench/benches/poseidon-1000.np``
(268,756 transcript bytes after the bin.rs header + zstd + postcard
envelope).  That file is bit-level ground truth for every wire encoding —
spongefish NARG layout, pow-nonce framing, ark MultiPath / stir-answer
hint bodies, and the WHIR round-parameter schedule.

These tests walk those bytes END-TO-END with this package's own IO-pattern
generator, Go-parse mirror and hint deserializers.  The scheme shape is
derived from the workload: m = 21, m_0 = 20 (the reference's compiled
poseidon-1000 circuit has 2^19 < witnesses <= 2^20 and likewise
constraints, matching our own compiler's 515,003 x 515,005 for the same
program), blinding over log2ceil(4*m_0)+1 = 8 variables — exactly
``WhirR1CSScheme::new_for_r1cs`` (r1cs-compiler/src/whir_r1cs.rs:15-54).

What the walk pins (any drift fails loudly):

* the complete op sequence of ``create_io_pattern``
  (common/src/whir_r1cs.rs:28-39) including both nested
  ``commit_statement`` / ``add_whir_proof`` expansions;
* grinding nonces as 8 big-endian wire bytes (spongefish-pow
  "pow-nonce"; the Go parse's size-bytes branch, common.go:93-96);
* per-opening hint order: stir_answers THEN merkle_proof;
* every absorb a canonical little-endian BN254 scalar;
* every hint body in ark CanonicalSerialize form as deserialized by
  whir/hints.py (MultiPath prefix compression included);
* the ConjectureList round schedule (whir/parameters.py): the witness
  WHIR's per-round query counts 109/28/16/11 + 9 final and tree depths
  17/16/15/14/13 appear verbatim in the Rust proof.
"""

from __future__ import annotations

import pathlib

import pytest

from provekit_tpu.fields import bn254 as F
from provekit_tpu.io import go_parse
from provekit_tpu.protocol.scheme import WhirR1CSScheme
from provekit_tpu.whir.parameters import WhirConfig

REFERENCE_NP = pathlib.Path(
    "/root/reference/tooling/provekit-bench/benches/poseidon-1000.np")

needs_reference = pytest.mark.skipif(
    not REFERENCE_NP.exists(), reason="reference checkout not mounted")


def reference_transcript() -> bytes:
    """Read the Rust proof through our own artifact reader (io/files.py
    understands version-0 Rust-postcard proof bodies)."""
    from provekit_tpu.io import files
    proof = files.read(REFERENCE_NP)
    return proof.transcript


def reference_scheme() -> WhirR1CSScheme:
    return WhirR1CSScheme(
        m=21, m_0=20, a_num_terms=21,
        whir_witness=WhirConfig(num_variables=21, batch_size=2),
        whir_for_hiding_spartan=WhirConfig(num_variables=8, batch_size=2))


def ops_of(scheme: WhirR1CSScheme) -> list[go_parse.Op]:
    return [go_parse.Op(op.kind, op.count, op.label)
            for op in scheme.create_io_pattern().ops]


@needs_reference
def test_header_and_envelope():
    """bin.rs framing: magic, ASCII tag, version, zstd, postcard varint."""
    blob = REFERENCE_NP.read_bytes()
    assert blob[:8] == b"\xDC\xDFOZkp\x01\x00"
    assert blob[8:16] == b"NPSProof"
    transcript = reference_transcript()
    assert len(transcript) == 268756


@needs_reference
def test_full_structural_walk():
    """Our generated IO pattern consumes the Rust transcript exactly."""
    transcript = reference_transcript()
    ops = ops_of(reference_scheme())
    parsed = go_parse.walk_transcript(ops, transcript)

    # ten openings: blinding (initial + 1 round), witness (initial + 3
    # rounds + final) — (stir_answers, merkle_proof) pairs each
    assert len(parsed.merkle_paths) == 7
    assert len(parsed.stir_answers) == 7
    # deferred weights: 1 scalar for the blinding proof, 3 for the witness
    assert len(parsed.deferred) == 4
    f_sums, g_sums = parsed.claimed_evaluations
    assert len(f_sums) == 3 and len(g_sums) == 3
    assert all(0 <= v < F.P for v in parsed.deferred + f_sums + g_sums)


@needs_reference
def test_absorbs_canonical_and_nonces_small():
    """Every absorbed scalar is canonical; every 8-byte big-endian nonce
    decodes to a plausible grinding result (tiny vs 2^64)."""
    transcript = reference_transcript()
    scheme = reference_scheme()
    pos = 0
    nonces = []
    for op in scheme.create_io_pattern().ops:
        if op.kind == "H":
            n = int.from_bytes(transcript[pos:pos + 4], "little")
            pos += 4 + n
        elif op.kind == "A" and op.label == "pow-nonce":
            nonces.append(int.from_bytes(transcript[pos:pos + 8], "big"))
            pos += 8
        elif op.kind == "A":
            for _ in range(op.count):
                v = int.from_bytes(transcript[pos:pos + 32], "little")
                assert v < F.P, f"non-canonical scalar at {pos}"
                pos += 32
    assert pos == len(transcript)
    # both configs grind ~19-22 bits -> nonces cluster far below 2^40;
    # a little-endian misread would produce astronomically large values
    assert nonces and all(n < 1 << 40 for n in nonces)


@needs_reference
def test_round_schedule_matches_hint_geometry():
    """The ConjectureList schedule appears verbatim in the Rust proof."""
    transcript = reference_transcript()
    scheme = reference_scheme()
    parsed = go_parse.walk_transcript(ops_of(scheme), transcript)

    wit = scheme.whir_witness
    assert wit.n_rounds == 4
    assert [rc.num_queries for rc in wit.rounds] == [109, 28, 16, 11]
    assert wit.final_queries == 9
    # NOTE the off-by-one pairing: opening r queries the PREVIOUS round's
    # oracle, so observed unique-leaf counts follow 109/28/16/11/9 with
    # the initial opening drawing round-0's 109 queries.
    blind = scheme.whir_for_hiding_spartan
    assert blind.n_rounds == 1

    geoms = []   # (n_leaves, tree_depth, leaf_width)
    for (idx, sibs, paths), answers in zip(parsed.merkle_paths,
                                           parsed.stir_answers):
        depth = len(paths[0]) + 1 if paths and paths[0] else 1
        widths = {len(row) for row in answers}
        assert len(widths) == 1
        assert len(idx) == len(answers)
        assert idx == sorted(set(idx)), "indexes not sorted-deduped"
        geoms.append((len(idx), depth, widths.pop()))

    # blinding WHIR: 2^9 domain, 2^4 fold, batch 2 -> 32-leaf tree with
    # 32-wide batched leaves; round opening 16-leaf tree, 16-wide
    assert geoms[0] == (32, 5, 32)
    assert geoms[1][1:] == (4, 16) and geoms[1][0] <= 16
    # witness WHIR: 2^22 domain, 2^4 fold, batch 2 -> depth-18 tree with
    # 32-wide leaves and 109 unique queries, then 28/16/11 in rounds and
    # 9 finals on successively halved domains
    assert geoms[2] == (109, 18, 32)
    assert [g[1:] for g in geoms[3:]] == [
        (17, 16), (16, 16), (15, 16), (14, 16)]
    # round-(r+1) openings draw round-r query counts; 109 draws into 2^18
    # leaves happen to stay collision-free in this proof
    assert [g[0] for g in geoms[3:]] == [28, 16, 11, 9]
    assert wit.rounds[0].ood_samples == 1

    # every opened index addresses a real leaf of its tree (a tree whose
    # auth paths have `depth-1` internal rows + the leaf sibling has
    # 2^depth leaves)
    for (idx, _, _), (n, depth, _) in zip(parsed.merkle_paths, geoms):
        assert max(idx) < 1 << depth


@needs_reference
def test_proof_size_budget_covers_rust_proof():
    """Our derivable size budget upper-bounds the Rust proof's actual
    size for the same scheme shape (PARITY: proof_size_budget)."""
    scheme = reference_scheme()
    assert len(reference_transcript()) <= scheme.proof_size_budget()
