"""Serialization of Merkle-opening hints (STIR answers) into the transcript.

Hints are proof data the verifier checks against absorbed roots but never
absorbs (spongefish ``merlin.hint`` / ``arthur.hint`` usage,
reference prover/src/whir_r1cs.rs:90, verifier/src/whir_r1cs.rs:54).
Format: [u32 n][u32 idx]*n [leaf scalars]*(n*leaf_elems) [path scalars]*(n*depth).
"""

from __future__ import annotations

from ..fields import bn254 as F


def serialize_openings(indices: list[int], leaf_values: list[list[int]],
                       paths: list[list[int]]) -> bytes:
    out = bytearray()
    out += len(indices).to_bytes(4, "little")
    for i in indices:
        out += int(i).to_bytes(4, "little")
    for vals in leaf_values:
        for v in vals:
            out += F.to_bytes_le(v)
    for path in paths:
        for v in path:
            out += F.to_bytes_le(v)
    return bytes(out)


def deserialize_openings(data: bytes, leaf_elems: int, depth: int):
    pos = 0

    def take(n):
        nonlocal pos
        if pos + n > len(data):
            raise ValueError("hint truncated")
        out = data[pos:pos + n]
        pos += n
        return out

    n = int.from_bytes(take(4), "little")
    if n > 1 << 20:
        raise ValueError("absurd opening count")
    indices = [int.from_bytes(take(4), "little") for _ in range(n)]
    leaf_values, paths = [], []
    for _ in range(n):
        vals = []
        for _ in range(leaf_elems):
            v = int.from_bytes(take(32), "little")
            if v >= F.P:
                raise ValueError("non-canonical scalar in hint")
            vals.append(v)
        leaf_values.append(vals)
    for _ in range(n):
        path = []
        for _ in range(depth):
            v = int.from_bytes(take(32), "little")
            if v >= F.P:
                raise ValueError("non-canonical scalar in hint")
            path.append(v)
        paths.append(path)
    if pos != len(data):
        raise ValueError("trailing hint bytes")
    return indices, leaf_values, paths
