from . import files, gnark

__all__ = ["files", "gnark"]
