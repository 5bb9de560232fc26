from .numeric import cents, round2

__all__ = ["cents", "round2"]
