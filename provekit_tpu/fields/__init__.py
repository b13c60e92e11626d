from . import bn254, m31, vector

__all__ = ["bn254", "m31", "vector"]
