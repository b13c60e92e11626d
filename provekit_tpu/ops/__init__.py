from . import merkle, ntt, pow, sumcheck

__all__ = ["merkle", "ntt", "pow", "sumcheck"]
