from . import poseidon

__all__ = ["poseidon", "sha256", "p256", "passport"]
