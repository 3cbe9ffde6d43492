"""Perceptual image hash (pHash): 32×32 resample → 2-D DCT-II →
63 low-frequency sign bits.

The classic DCT perceptual hash (Zauner's pHash construction): a
brightness shift moves only the DC coefficient, uniform rescaling
moves magnitudes but not the above-median pattern, and small local
edits perturb few low-frequency coefficients — so visually-near
images land within a small Hamming distance while unrelated content
scatters ~half the bits.  Pure numpy (one matmul pair per image);
decoded pixels come from the in-repo codecs (functions/png.py etc.).
"""

from __future__ import annotations

import numpy as np

PHASH_SIZE = 32        # resample target (N×N) before the DCT
PHASH_KEEP = 8         # top-left KEEP×KEEP low-frequency block


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: D @ a applies the DCT along axis 0."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix(PHASH_SIZE)


def phash63(width: int, height: int, channels: int, px: bytes) -> int:
    """63-bit perceptual hash of a decoded image (any channel count;
    luma = channel mean).  Deterministic: nearest-neighbor resample,
    float64 DCT, strict > median over the 63 non-DC coefficients of
    the 8×8 low-frequency block (DC itself is excluded — brightness
    invariance)."""
    a = np.frombuffer(px, dtype=np.uint8).astype(np.float64)
    a = a.reshape(height, width, channels).mean(axis=2)
    ys = (np.arange(PHASH_SIZE) * height) // PHASH_SIZE
    xs = (np.arange(PHASH_SIZE) * width) // PHASH_SIZE
    small = a[np.ix_(ys, xs)]
    coef = _DCT @ small @ _DCT.T
    low = coef[:PHASH_KEEP, :PHASH_KEEP].flatten()[1:]   # drop DC
    med = np.median(low)
    bits = low > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out
