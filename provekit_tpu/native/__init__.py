"""ctypes bindings for the native (C++) host kernels.

``native/`` builds ``libpknative.so`` (witness-program interpreter,
Skyscraper, Merkle path check) — the host-sequential counterpart of the
reference's Rust scalar kernels.  Falls back to the pure-Python paths when
the library is absent; ``python -m provekit_tpu.native.build`` compiles it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpknative.so"

_lib = None


def build(quiet: bool = False) -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=quiet)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pk_solve_witness.restype = ctypes.c_int
    lib.pk_solve_witness.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,          # program
        ctypes.c_char_p, ctypes.c_size_t,          # acir pairs
        ctypes.c_uint32,                           # num witnesses
        ctypes.c_char_p,                           # iv[32]
        ctypes.c_char_p, ctypes.c_size_t,          # seed scalars
        ctypes.c_char_p, ctypes.c_char_p,          # out witness, out mask
    ]
    lib.pk_compress.argtypes = [ctypes.c_char_p] * 3
    lib.pk_permute.argtypes = [ctypes.c_char_p] * 2
    lib.pk_merkle_verify.restype = ctypes.c_int
    lib.pk_merkle_verify.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.c_uint64, ctypes.c_char_p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def compress(l: int, r: int) -> int:
    from ..fields import bn254 as F
    lib = load()
    out = ctypes.create_string_buffer(32)
    lib.pk_compress(F.to_bytes_le(l), F.to_bytes_le(r), out)
    return int.from_bytes(out.raw, "little")


def permute(l: int, r: int) -> tuple[int, int]:
    from ..fields import bn254 as F
    lib = load()
    lb = ctypes.create_string_buffer(F.to_bytes_le(l), 32)
    rb = ctypes.create_string_buffer(F.to_bytes_le(r), 32)
    lib.pk_permute(lb, rb)
    return (int.from_bytes(lb.raw, "little"),
            int.from_bytes(rb.raw, "little"))


def merkle_verify(leaf_values: list[int], path: list[int], index: int,
                  root: int) -> bool:
    from ..fields import bn254 as F
    lib = load()
    lv = b"".join(F.to_bytes_le(v) for v in leaf_values)
    pv = b"".join(F.to_bytes_le(v) for v in path)
    return bool(lib.pk_merkle_verify(lv, len(leaf_values), pv, len(path),
                                     index, F.to_bytes_le(root)))


def solve_witness(program: bytes, acir_values: dict[int, int],
                  num_witnesses: int, iv: bytes,
                  seed_scalars: list[int]):
    """Returns (witness list with None for unsolved, or raises)."""
    from ..fields import bn254 as F
    lib = load()
    pairs = b"".join(
        int(k).to_bytes(4, "little") + F.to_bytes_le(v % F.P)
        for k, v in acir_values.items())
    seeds = b"".join(F.to_bytes_le(s % F.P) for s in seed_scalars)
    out_w = ctypes.create_string_buffer(32 * num_witnesses)
    out_m = ctypes.create_string_buffer(num_witnesses)
    rc = lib.pk_solve_witness(program, len(program), pairs,
                              len(acir_values), num_witnesses, iv,
                              seeds, len(seed_scalars), out_w, out_m)
    if rc != 0:
        raise RuntimeError(f"native witness solver failed (code {rc})")
    raw, mask = out_w.raw, out_m.raw
    return [int.from_bytes(raw[32 * i:32 * (i + 1)], "little")
            if mask[i] else None for i in range(num_witnesses)]
