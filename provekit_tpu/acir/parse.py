"""Noir build-artifact parsing: JSON envelope -> ACIR Program.

The artifact is JSON with a base64 ``bytecode`` field
(``tooling/cli/src/cmd/circuit_stats.rs:39-53``); the bytecode is a
gzip-compressed serialized ``Program`` (noir v1.0.0-beta.6 serializes ACIR
with msgpack; older artifacts used bincode).  This module implements the
envelope, gzip, and a self-contained msgpack decoder, then maps the decoded
document onto :mod:`provekit_tpu.acir.model`.

EXPERIMENTAL: validated structurally; no golden artifacts are available in
this environment (no nargo toolchain), so field-name drift against a given
nargo version will surface as descriptive ``AcirParseError``s.
"""

from __future__ import annotations

import base64
import gzip
import json
import struct
from pathlib import Path

from . import model as acir
from .abi import Abi


class AcirParseError(Exception):
    pass


# ---------------------------------------------------------------------------
# Minimal msgpack decoder (spec-complete for the types ACIR uses)


def _msgpack_decode(data: bytes):
    pos = 0

    def take(n):
        nonlocal pos
        if pos + n > len(data):
            raise AcirParseError("msgpack truncated")
        out = data[pos:pos + n]
        pos += n
        return out

    def u(fmt, n):
        return struct.unpack(fmt, take(n))[0]

    def value():
        b = take(1)[0]
        if b <= 0x7F:
            return b
        if b >= 0xE0:
            return b - 0x100
        if 0x80 <= b <= 0x8F:
            return {value(): value() for _ in range(b & 0x0F)}
        if 0x90 <= b <= 0x9F:
            return [value() for _ in range(b & 0x0F)]
        if 0xA0 <= b <= 0xBF:
            return take(b & 0x1F).decode("utf-8")
        if b == 0xC0:
            return None
        if b == 0xC2:
            return False
        if b == 0xC3:
            return True
        if b == 0xC4:
            return bytes(take(take(1)[0]))
        if b == 0xC5:
            return bytes(take(u(">H", 2)))
        if b == 0xC6:
            return bytes(take(u(">I", 4)))
        if b == 0xCA:
            return u(">f", 4)
        if b == 0xCB:
            return u(">d", 8)
        if b == 0xCC:
            return take(1)[0]
        if b == 0xCD:
            return u(">H", 2)
        if b == 0xCE:
            return u(">I", 4)
        if b == 0xCF:
            return u(">Q", 8)
        if b == 0xD0:
            return u(">b", 1)
        if b == 0xD1:
            return u(">h", 2)
        if b == 0xD2:
            return u(">i", 4)
        if b == 0xD3:
            return u(">q", 8)
        if b == 0xD9:
            return take(take(1)[0]).decode("utf-8")
        if b == 0xDA:
            return take(u(">H", 2)).decode("utf-8")
        if b == 0xDB:
            return take(u(">I", 4)).decode("utf-8")
        if b == 0xDC:
            return [value() for _ in range(u(">H", 2))]
        if b == 0xDD:
            return [value() for _ in range(u(">I", 4))]
        if b == 0xDE:
            return {value(): value() for _ in range(u(">H", 2))}
        if b == 0xDF:
            return {value(): value() for _ in range(u(">I", 4))}
        raise AcirParseError(f"msgpack: unsupported tag 0x{b:02x}")

    out = value()
    if pos != len(data):
        raise AcirParseError(f"msgpack: {len(data) - pos} trailing bytes")
    return out


# ---------------------------------------------------------------------------
# Document -> model mapping


def _field_int(v) -> int:
    """ACIR field elements serialize as hex/dec strings or byte arrays."""
    if isinstance(v, str):
        return int(v, 16) if v.startswith("0x") else int(v)
    if isinstance(v, bytes):
        return int.from_bytes(v, "big")
    if isinstance(v, int):
        return v
    if isinstance(v, list) and all(isinstance(x, int) for x in v):
        return int.from_bytes(bytes(x & 0xFF for x in v), "big")
    raise AcirParseError(f"cannot interpret field element {v!r}")


def _witness(v) -> acir.Witness:
    if isinstance(v, int):
        return acir.Witness(v)
    if isinstance(v, dict) and len(v) == 1:
        return acir.Witness(next(iter(v.values())))
    if isinstance(v, list) and len(v) == 1:
        return acir.Witness(v[0])
    raise AcirParseError(f"cannot interpret witness {v!r}")


def _variant(v):
    """Enum encodings: {"Name": payload} or "Name"."""
    if isinstance(v, str):
        return v, None
    if isinstance(v, dict) and len(v) == 1:
        k = next(iter(v))
        return k, v[k]
    raise AcirParseError(f"cannot interpret enum {v!r}")


def _expression(doc) -> acir.Expression:
    mul = [(_field_int(c), _witness(a), _witness(b))
           for c, a, b in doc.get("mul_terms", [])]
    lin = [(_field_int(c), _witness(w))
           for c, w in doc.get("linear_combinations", [])]
    return acir.Expression(mul_terms=mul, linear_combinations=lin,
                           q_c=_field_int(doc.get("q_c", 0)))


def _function_input(doc) -> acir.FunctionInput:
    # { "input": {"Witness": n} | {"Constant": field}, "num_bits": k }
    inp = doc.get("input", doc)
    num_bits = doc.get("num_bits", 254)
    kind, payload = _variant(inp) if not isinstance(inp, int) else ("Witness", inp)
    if kind == "Witness":
        return acir.FunctionInput(_witness(payload), num_bits)
    if kind == "Constant":
        return acir.FunctionInput(_field_int(payload), num_bits)
    raise AcirParseError(f"unknown FunctionInput {doc!r}")


def _blackbox(payload) -> acir.Opcode:
    kind, body = _variant(payload)
    if kind == "RANGE":
        return acir.BlackBoxRange(_function_input(body["input"]))
    if kind in ("AND", "XOR"):
        cls = acir.BlackBoxAnd if kind == "AND" else acir.BlackBoxXor
        return cls(_function_input(body["lhs"]), _function_input(body["rhs"]),
                   _witness(body["output"]))
    return acir.BlackBoxUnsupported(kind, body)


def _opcode(doc) -> acir.Opcode:
    kind, payload = _variant(doc)
    if kind == "AssertZero":
        return acir.AssertZero(_expression(payload))
    if kind == "BrilligCall":
        return acir.BrilligCall(
            id=payload.get("id", 0),
            inputs=payload.get("inputs", []),
            outputs=payload.get("outputs", []))
    if kind == "MemoryInit":
        bt, _ = _variant(payload.get("block_type", "Memory"))
        return acir.MemoryInit(
            block_id=_block_id(payload["block_id"]),
            init=[_witness(w) for w in payload["init"]],
            block_type=bt)
    if kind == "MemoryOp":
        op = payload["op"]
        return acir.MemoryOp(
            block_id=_block_id(payload["block_id"]),
            op=acir.MemOp(
                operation=_op_flag(op["operation"]),
                index=_expression(op["index"]),
                value=_expression(op["value"])),
            predicate=None if payload.get("predicate") is None
            else _expression(payload["predicate"]))
    if kind == "BlackBoxFuncCall":
        return _blackbox(payload)
    raise AcirParseError(f"unsupported opcode {kind}")


def _block_id(v) -> int:
    if isinstance(v, int):
        return v
    if isinstance(v, (list, dict)) and len(v) == 1:
        return next(iter(v.values())) if isinstance(v, dict) else v[0]
    raise AcirParseError(f"cannot interpret block id {v!r}")


def _op_flag(expr_doc) -> int:
    """MemOp.operation is an Expression equal to constant 0 (read) / 1 (write)."""
    e = _expression(expr_doc)
    if e.mul_terms or e.linear_combinations:
        raise AcirParseError("MemoryOp.operation must be constant")
    return e.q_c


def _public_inputs(v) -> list[int]:
    if isinstance(v, list):
        return [w.index if isinstance(w, acir.Witness) else
                (_witness(w).index) for w in v]
    if isinstance(v, dict) and len(v) == 1:
        return _public_inputs(next(iter(v.values())))
    raise AcirParseError(f"cannot interpret public inputs {v!r}")


def _circuit(doc) -> acir.Circuit:
    return acir.Circuit(
        opcodes=[_opcode(op) for op in doc["opcodes"]],
        private_parameters=_public_inputs(doc.get("private_parameters", [])),
        public_parameters=_public_inputs(doc.get("public_parameters", [])),
        return_values=_public_inputs(doc.get("return_values", [])),
        current_witness_index=doc.get("current_witness_index", 0))


def program_from_doc(doc) -> acir.Program:
    return acir.Program(
        functions=[_circuit(f) for f in doc["functions"]],
        unconstrained_functions=doc.get("unconstrained_functions", []))


def parse_bytecode(bytecode: bytes) -> acir.Program:
    if bytecode[:2] == b"\x1f\x8b":
        bytecode = gzip.decompress(bytecode)
    try:
        doc = _msgpack_decode(bytecode)
    except AcirParseError as e:
        raise AcirParseError(
            f"could not decode ACIR bytecode as msgpack ({e}); bincode-era "
            "artifacts are not yet supported — recompile with nargo >= "
            "1.0.0-beta.4 or supply provekit-tpu circuit JSON") from e
    return program_from_doc(doc)


def parse_artifact(doc_or_path) -> acir.Program:
    """Parse a Noir build artifact (dict or path to JSON)."""
    if isinstance(doc_or_path, (str, Path)):
        doc = json.loads(Path(doc_or_path).read_text())
    else:
        doc = doc_or_path
    if "bytecode" not in doc:
        raise AcirParseError("artifact has no bytecode field")
    return parse_bytecode(base64.b64decode(doc["bytecode"]))


def artifact_abi(doc_or_path) -> Abi:
    if isinstance(doc_or_path, (str, Path)):
        doc = json.loads(Path(doc_or_path).read_text())
    else:
        doc = doc_or_path
    return Abi.from_json(doc.get("abi", {}))
