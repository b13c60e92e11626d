"""Compact binary body encoding for artifacts (postcard-discipline).

The reference serializes ``.nps``/``.np`` bodies with Rust ``postcard``
(LEB128 varints, length-prefixed sequences, no self-description beyond the
schema — ``provekit/common/src/file/bin.rs:16-111``).  This is the same
encoding discipline applied to the provekit-tpu document tree: tagged nodes,
zigzag LEB128 varints, length-prefixed strings/bytes/sequences, and a raw
little-endian u32-array fast path for the sparse-matrix index vectors.

Byte-compatibility with Rust postcard is not claimed (the Rust struct
layouts belong to external git dependencies that are not vendored in the
reference); the format here is versioned independently (header byte 'B1').
"""

from __future__ import annotations

import struct

MAGIC = b"PKB1"

_T_NONE = 0x00
_T_FALSE = 0x01
_T_TRUE = 0x02
_T_INT = 0x03      # zigzag LEB128
_T_BIGINT = 0x04   # sign byte + length + LE magnitude
_T_STR = 0x05
_T_BYTES = 0x06
_T_LIST = 0x07
_T_MAP = 0x08
_T_U32S = 0x09     # count + raw LE u32 payload
_T_FLOAT = 0x0A    # f64 BE (WHIR pow_bits are floats)


def _uvarint(n: int, out: bytearray) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1 | 1


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _enc_node(obj, out: bytearray) -> None:
    if obj is None:
        out.append(_T_NONE)
    elif obj is False:
        out.append(_T_FALSE)
    elif obj is True:
        out.append(_T_TRUE)
    elif isinstance(obj, int):
        if -(1 << 62) <= obj < (1 << 62):
            out.append(_T_INT)
            _uvarint(_zigzag(obj), out)
        else:
            out.append(_T_BIGINT)
            mag = abs(obj)
            raw = mag.to_bytes((mag.bit_length() + 7) // 8 or 1, "little")
            out.append(1 if obj < 0 else 0)
            _uvarint(len(raw), out)
            out.extend(raw)
    elif isinstance(obj, float):
        out.append(_T_FLOAT)
        out.extend(struct.pack(">d", obj))
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        out.append(_T_STR)
        _uvarint(len(raw), out)
        out.extend(raw)
    elif isinstance(obj, (bytes, bytearray)):
        out.append(_T_BYTES)
        _uvarint(len(obj), out)
        out.extend(obj)
    elif isinstance(obj, U32Array):
        out.append(_T_U32S)
        _uvarint(len(obj.raw) // 4, out)
        out.extend(obj.raw)
    elif isinstance(obj, (list, tuple)):
        out.append(_T_LIST)
        _uvarint(len(obj), out)
        for v in obj:
            _enc_node(v, out)
    elif isinstance(obj, dict):
        out.append(_T_MAP)
        _uvarint(len(obj), out)
        for k, v in obj.items():
            _enc_node(k, out)
            _enc_node(v, out)
    else:
        raise TypeError(f"cannot binary-encode {type(obj).__name__}")


class U32Array:
    """Marker wrapper: a u32 vector stored as raw LE bytes."""

    __slots__ = ("raw",)

    def __init__(self, values=None, raw: bytes = b""):
        if values is not None:
            import numpy as np
            self.raw = np.asarray(values, dtype="<u4").tobytes()
        else:
            self.raw = raw

    def tolist(self) -> list[int]:
        import numpy as np
        return np.frombuffer(self.raw, dtype="<u4").tolist()


def encode(doc) -> bytes:
    out = bytearray(MAGIC)
    _enc_node(doc, out)
    return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("binary body truncated")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def uvarint(self) -> int:
        shift = 0
        val = 0
        while True:
            b = self.take(1)[0]
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7
            if shift > 91:
                raise ValueError("varint too long")

    def node(self):
        t = self.take(1)[0]
        if t == _T_NONE:
            return None
        if t == _T_FALSE:
            return False
        if t == _T_TRUE:
            return True
        if t == _T_INT:
            return _unzigzag(self.uvarint())
        if t == _T_BIGINT:
            neg = self.take(1)[0]
            mag = int.from_bytes(self.take(self.uvarint()), "little")
            return -mag if neg else mag
        if t == _T_FLOAT:
            return struct.unpack(">d", self.take(8))[0]
        if t == _T_STR:
            return self.take(self.uvarint()).decode("utf-8")
        if t == _T_BYTES:
            return bytes(self.take(self.uvarint()))
        if t == _T_U32S:
            return U32Array(raw=bytes(self.take(self.uvarint() * 4)))
        if t == _T_LIST:
            return [self.node() for _ in range(self.uvarint())]
        if t == _T_MAP:
            return {self.node(): self.node() for _ in range(self.uvarint())}
        raise ValueError(f"unknown binary tag 0x{t:02x}")


def decode(buf: bytes):
    if buf[:4] != MAGIC:
        raise ValueError("not a provekit-tpu binary body")
    r = _Reader(buf, 4)
    doc = r.node()
    if r.pos != len(buf):
        raise ValueError(f"{len(buf) - r.pos} trailing bytes in binary body")
    return doc
