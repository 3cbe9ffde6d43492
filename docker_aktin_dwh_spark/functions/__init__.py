from .determinism import davg, dsum, round2
from .textfns import shingles, tokens

__all__ = ["dsum", "davg", "round2", "tokens", "shingles"]
