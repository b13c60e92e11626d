"""Serialize a WitnessBuilder program to the native interpreter's encoding.

Must stay in lock-step with the reader in ``native/solver.cpp`` (opcodes
documented there).  Differentially tested against the Python solver.
"""

from __future__ import annotations

import struct

from ..fields import bn254 as F
from ..r1cs import witness_builder as wb


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


def _fe(v: int) -> bytes:
    return F.to_bytes_le(v % F.P)


def _operand(op) -> bytes:
    kind, v = op
    if kind == "const":
        return b"\x00" + _fe(v)
    return b"\x01" + _u32(v)


def encode_program(builders: list) -> bytes:
    out = bytearray()
    for b in builders:
        if isinstance(b, wb.Constant):
            out += b"\x00" + _u32(b.witness_idx) + _fe(b.value)
        elif isinstance(b, wb.Acir):
            out += b"\x01" + _u32(b.witness_idx) + _u32(b.acir_witness_idx)
        elif isinstance(b, wb.Sum):
            out += b"\x02" + _u32(b.witness_idx) + _u32(len(b.terms))
            for coeff, idx in b.terms:
                if coeff is None:
                    out += b"\x00" + _u32(idx)
                else:
                    out += b"\x01" + _fe(coeff) + _u32(idx)
        elif isinstance(b, wb.Product):
            out += b"\x03" + _u32(b.witness_idx) + _u32(b.a) + _u32(b.b)
        elif isinstance(b, wb.MultiplicitiesForRange):
            out += (b"\x04" + _u32(b.start_idx) + _u32(b.range_size)
                    + _u32(len(b.value_witnesses)))
            for v in b.value_witnesses:
                out += _u32(v)
        elif isinstance(b, wb.Challenge):
            out += b"\x05" + _u32(b.witness_idx)
        elif isinstance(b, wb.IndexedLogUpDenominator):
            out += (b"\x06" + _u32(b.witness_idx) + _u32(b.sz_challenge)
                    + _fe(b.index_coeff) + _u32(b.index)
                    + _u32(b.rs_challenge) + _u32(b.value))
        elif isinstance(b, wb.Inverse):
            out += b"\x07" + _u32(b.witness_idx) + _u32(b.operand)
        elif isinstance(b, wb.ProductLinearOperation):
            out += (b"\x08" + _u32(b.witness_idx) + _u32(b.x) + _fe(b.a)
                    + _fe(b.b) + _u32(b.y) + _fe(b.c) + _fe(b.d))
        elif isinstance(b, wb.LogUpDenominator):
            out += (b"\x09" + _u32(b.witness_idx) + _u32(b.sz_challenge)
                    + _fe(b.value_coeff) + _u32(b.value))
        elif isinstance(b, wb.DigitalDecomposition):
            out += (b"\x0a" + _u32(b.first_witness_idx)
                    + _u32(len(b.log_bases))
                    + bytes(b.log_bases)
                    + _u32(len(b.witnesses_to_decompose)))
            for v in b.witnesses_to_decompose:
                out += _u32(v)
        elif isinstance(b, wb.SpiceWitnesses):
            out += (b"\x0b" + _u32(b.memory_length)
                    + _u32(b.initial_values_start) + _u32(b.rv_final_start)
                    + _u32(b.rt_final_start) + _u32(len(b.memory_operations)))
            for op in b.memory_operations:
                if isinstance(op, wb.SpiceLoad):
                    out += (b"\x00" + _u32(op.addr) + _u32(op.value)
                            + _u32(op.read_timestamp))
                else:
                    out += (b"\x01" + _u32(op.addr) + _u32(op.old_value)
                            + _u32(op.new_value) + _u32(op.read_timestamp))
        elif isinstance(b, wb.SpiceMultisetFactor):
            out += (b"\x0c" + _u32(b.witness_idx) + _u32(b.sz_challenge)
                    + _u32(b.rs_challenge) + _fe(b.addr)
                    + _u32(b.addr_witness) + _u32(b.value) + _fe(b.timer)
                    + _u32(b.timer_witness))
        elif isinstance(b, wb.BinOpLookupDenominator):
            out += (b"\x0d" + _u32(b.witness_idx) + _u32(b.sz_challenge)
                    + _u32(b.rs_challenge) + _u32(b.rs_challenge_sqrd)
                    + _operand(b.lhs) + _operand(b.rhs) + _operand(b.output))
        elif isinstance(b, wb.MultiplicitiesForBinOp):
            out += b"\x0e" + _u32(b.witness_idx) + _u32(len(b.operands))
            for lhs, rhs in b.operands:
                out += _operand(lhs) + _operand(rhs)
        else:
            raise TypeError(f"cannot encode builder {type(b)}")
    return bytes(out)
