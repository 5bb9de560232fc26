from .numeric import round2

__all__ = ["round2"]
