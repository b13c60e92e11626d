from . import bn254, vector

__all__ = ["bn254", "vector"]
