"""R1CS constraint system: interner, CSR/COO sparse matrices, TPU matvecs.

Mirrors the reference data model (``provekit/common/src/r1cs.rs:8-103``,
``sparse_matrix.rs:12-27``, ``interner.rs:6-12``): three sparse matrices
A, B, C over Fr with interned coefficient values, satisfying
``(A z) o (B z) == C z``.  Witness index 0 is the constant-one column.

TPU design: matrices freeze to device COO arrays (rows, cols, Montgomery
value planes); matvec = gather + batched Montgomery product + modular
segment-sum — replacing the serial row loops the reference marks
"OPT: Paralelize" (``sparse_matrix.rs:148,168``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..fields.wide import segment_sum_mod_split, split_oversized_segments


class Interner:
    """Deduplicates field constants (reference: O(n) scan; here a dict)."""

    def __init__(self):
        self.values: list[int] = []
        self._index: dict[int, int] = {}

    def intern(self, value: int) -> int:
        value %= F.P
        idx = self._index.get(value)
        if idx is None:
            idx = len(self.values)
            self.values.append(value)
            self._index[value] = idx
        return idx

    def get(self, idx: int) -> int:
        return self.values[idx]

    def __len__(self) -> int:
        return len(self.values)


class SparseMatrix:
    """COO sparse matrix over Fr with interned values (build on host)."""

    def __init__(self, num_rows: int, num_cols: int, interner: Interner):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.interner = interner
        self.rows: list[int] = []
        self.cols: list[int] = []
        self.value_ids: list[int] = []
        self._frozen = None

    def set(self, row: int, col: int, value: int) -> None:
        assert 0 <= row and 0 <= col < self.num_cols
        self.num_rows = max(self.num_rows, row + 1)
        self.rows.append(row)
        self.cols.append(col)
        self.value_ids.append(self.interner.intern(value))
        self._frozen = None

    def grow(self, num_rows: int, num_cols: int) -> None:
        self.num_rows = max(self.num_rows, num_rows)
        self.num_cols = max(self.num_cols, num_cols)
        self._frozen = None

    @property
    def nnz(self) -> int:
        return len(self.rows)

    def iter_entries(self):
        for r, c, vid in zip(self.rows, self.cols, self.value_ids):
            yield r, c, self.interner.get(vid)

    # -- device side -------------------------------------------------------

    def frozen(self) -> "FrozenMatrix":
        if self._frozen is None:
            rows_np = np.asarray(self.rows, dtype=np.int32)
            cols_np = np.asarray(self.cols, dtype=np.int32)
            # pre-split segments with > 2^15 entries (LogUp sum rows; the
            # constant-one column) so device segment sums cannot overflow
            row_ids, row_extra = split_oversized_segments(
                rows_np, self.num_rows)
            col_ids, col_extra = split_oversized_segments(
                cols_np, self.num_cols)
            table = V.pack([F.to_mont(v) for v in self.interner.values])
            vids = jnp.asarray(np.asarray(self.value_ids, dtype=np.int32))
            vals = table[:, vids] if self.nnz else V.zeros((0,))
            self._frozen = FrozenMatrix(
                jnp.asarray(rows_np), jnp.asarray(cols_np), vals,
                self.num_rows, self.num_cols,
                jnp.asarray(row_ids),
                None if row_extra is None else jnp.asarray(row_extra),
                jnp.asarray(col_ids),
                None if col_extra is None else jnp.asarray(col_extra))
        return self._frozen

    def mul_right(self, z: jax.Array) -> jax.Array:
        """M @ z: z is (16, num_cols) Montgomery -> (16, num_rows) Montgomery."""
        return self.frozen().mul_right(z)

    def mul_left(self, e: jax.Array) -> jax.Array:
        """e^T @ M: e is (16, num_rows) Montgomery -> (16, num_cols)."""
        return self.frozen().mul_left(e)


HOST_TAIL_NNZ = 4096
# nnz chunk for the device matvec: caps the (32, chunk) wide-product temps
# at ~270 MB so multi-million-nnz circuits (sha256-chain) fit in HBM
import os as _os
MATVEC_CHUNK = int(_os.environ.get("PROVEKIT_TPU_MATVEC_CHUNK",
                                   str(1 << 21)))


@dataclass
class FrozenMatrix:
    rows: jax.Array  # (nnz,) int32
    cols: jax.Array  # (nnz,) int32
    vals: jax.Array  # (16, nnz) Montgomery
    num_rows: int
    num_cols: int
    # segment ids with oversized segments pre-split (see fields/wide.py);
    # *_extra maps overflow sub-segment -> parent, or None
    row_seg_ids: jax.Array = None
    row_extra: jax.Array = None
    col_seg_ids: jax.Array = None
    col_extra: jax.Array = None

    def _host_mul(self, vec: jax.Array, by, out_len: int) -> jax.Array:
        vv = [F.from_mont(v) for v in V.unpack(vec)]
        vals = [F.from_mont(v) for v in V.unpack(self.vals)]
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        out = [0] * out_len
        if by == "rows":
            for r, c, v in zip(rows, cols, vals):
                out[r] = (out[r] + v * vv[c]) % F.P
        else:
            for r, c, v in zip(rows, cols, vals):
                out[c] = (out[c] + v * vv[r]) % F.P
        return V.pack([F.to_mont(v) for v in out])

    def _chunked_mul(self, vec: jax.Array, gather_idx: jax.Array,
                     ids: jax.Array, extra, out_len: int) -> jax.Array:
        """Gather + Montgomery product + segment sum, chunked over nnz.

        One full-nnz pass materializes (32, nnz) wide-product temps —
        ~600 MB at sha256-chain scale, which RESOURCE_EXHAUSTs the chip.
        Chunk sums are exact mod-p partials of each segment, so the result
        is bit-identical to the single-pass form.
        """
        nnz = gather_idx.shape[0]
        if nnz <= MATVEC_CHUNK:
            prods = V.mont_mul(self.vals, vec[:, gather_idx])
            return segment_sum_mod_split(prods, ids, extra, out_len)
        acc = None
        for start in range(0, nnz, MATVEC_CHUNK):
            end = min(nnz, start + MATVEC_CHUNK)
            prods = V.mont_mul(self.vals[:, start:end],
                               vec[:, gather_idx[start:end]])
            part = segment_sum_mod_split(prods, ids[start:end], extra,
                                         out_len)
            acc = part if acc is None else V.add_mod(acc, part)
        return acc

    def mul_right(self, z: jax.Array) -> jax.Array:
        if self.rows.shape[0] <= HOST_TAIL_NNZ and not isinstance(
                z, jax.core.Tracer):
            return self._host_mul(z, "rows", self.num_rows)
        ids = self.rows if self.row_seg_ids is None else self.row_seg_ids
        return self._chunked_mul(z, self.cols, ids, self.row_extra,
                                 self.num_rows)

    def mul_left(self, e: jax.Array) -> jax.Array:
        if self.rows.shape[0] <= HOST_TAIL_NNZ and not isinstance(
                e, jax.core.Tracer):
            return self._host_mul(e, "cols", self.num_cols)
        ids = self.cols if self.col_seg_ids is None else self.col_seg_ids
        return self._chunked_mul(e, self.rows, ids, self.col_extra,
                                 self.num_cols)


class R1CS:
    """The constraint system (reference ``r1cs.rs``): A z o B z = C z."""

    def __init__(self):
        self.interner = Interner()
        self.a = SparseMatrix(0, 1, self.interner)
        self.b = SparseMatrix(0, 1, self.interner)
        self.c = SparseMatrix(0, 1, self.interner)
        self.num_public_inputs = 0
        self.num_witnesses = 1  # index 0 is the constant 1

    @property
    def num_constraints(self) -> int:
        return self.a.num_rows

    def new_witness(self) -> int:
        return self.new_witnesses(1)

    def new_witnesses(self, n: int) -> int:
        # hot path (one call per witness builder): direct attribute stores
        # instead of per-matrix grow() calls with max()
        first = self.num_witnesses
        nw = first + n
        self.num_witnesses = nw
        a, b, c = self.a, self.b, self.c
        a.num_cols = b.num_cols = c.num_cols = nw
        a._frozen = b._frozen = c._frozen = None
        return first

    def add_constraint(self, a_terms, b_terms, c_terms) -> None:
        """Each *_terms: iterable of (coeff:int, witness_index:int)."""
        # hot path (one call per constraint): inlined SparseMatrix.set
        row = self.a.num_rows
        new_rows = row + 1
        p = F.P
        for m, terms in ((self.a, a_terms), (self.b, b_terms),
                         (self.c, c_terms)):
            m.num_rows = new_rows
            m._frozen = None
            rows_app = m.rows.append
            cols_app = m.cols.append
            vids_app = m.value_ids.append
            intern = m.interner.intern
            for coeff, widx in terms:
                coeff %= p
                if coeff:
                    rows_app(row)
                    cols_app(widx)
                    vids_app(intern(coeff))

    # -- evaluation --------------------------------------------------------

    def witness_bounds(self, z: jax.Array):
        """(A z, B z, (A z) o (B z)) padded to a power of two.

        Matches ``calculate_witness_bounds`` (common/src/utils/sumcheck.rs:
        181-193): c is derived elementwise from a o b, not C z.
        """
        az = self.a.mul_right(z)
        bz = self.b.mul_right(z)
        cz = V.mont_mul(az, bz)
        n = self.num_constraints
        m = 1 << max(1, (n - 1).bit_length()) if n > 1 else 1
        pad = [(0, 0), (0, m - n)]
        return (jnp.pad(az, pad), jnp.pad(bz, pad), jnp.pad(cz, pad))

    def is_satisfied(self, z: jax.Array) -> bool:
        az = self.a.mul_right(z)
        bz = self.b.mul_right(z)
        cz = self.c.mul_right(z)
        lhs = V.mont_mul(az, bz)
        return bool(jnp.all(V.eq_mask(lhs, cz)))

    def check_z0(self, z: jax.Array) -> bool:
        one = V.pack([F.to_mont(1)])
        return bool(jnp.all(V.eq_mask(z[:, :1], one)))
