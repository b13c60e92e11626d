"""Build the native library: python -m provekit_tpu.native.build"""

from . import build, _LIB_PATH

if __name__ == "__main__":
    ok = build()
    print(f"built {_LIB_PATH}" if ok else "native build FAILED")
    raise SystemExit(0 if ok else 1)
