"""Tiny helpers shared by test modules (kept separate from helpers.py to
avoid pytest collection of fixture-heavy code)."""

import numpy as np


def make_bed_bytes(codes):
    M, N = codes.shape
    mb = (N + 3) // 4
    by = np.zeros((M, mb), dtype=np.uint8)
    for k in range(4):
        cols = np.arange(k, N, 4)
        by[:, (cols - k) // 4] |= (codes[:, cols].astype(np.uint8) << (2 * k))
    return by
