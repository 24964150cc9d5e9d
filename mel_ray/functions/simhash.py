"""SimHash (64-bit) over ragged shingle-hash sets, vectorized.

Charikar-style similarity fingerprint: each shingle hash votes its 64
bits ±1; the sign of each bit-sum is the fingerprint bit.  Near-duplicate
documents differ in few bits (Hamming distance).  Complements
MinHash-LSH as a second near-dup operator family (SURVEY.md §2.7 D6).
"""

from __future__ import annotations

import numpy as np

from .hashing import U64


def simhash64(values: np.ndarray, row_offsets: np.ndarray) -> np.ndarray:
    """(N,) uint64 simhash per row of a ragged uint64 shingle array."""
    n_rows = len(row_offsets) - 1
    if n_rows == 0:
        return np.empty(0, dtype=U64)
    values = np.asarray(values, dtype=U64)
    # bits matrix in chunks of 8 bit-planes to bound memory
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    starts = np.asarray(row_offsets[:-1], dtype=np.int64)
    red_idx = np.minimum(starts, max(len(values) - 1, 0))
    for b0 in range(0, 64, 8):
        shifts = np.arange(b0, b0 + 8, dtype=np.uint64)
        bits = ((values[:, None] >> shifts[None, :]) & U64(1)).astype(np.int64)
        votes = bits * 2 - 1  # ±1
        if len(values):
            acc[:, b0 : b0 + 8] = np.add.reduceat(votes, red_idx, axis=0)
        else:
            acc[:, b0 : b0 + 8] = 0
    empty = row_offsets[1:] == row_offsets[:-1]
    acc[empty, :] = -1
    out = np.zeros(n_rows, dtype=U64)
    with np.errstate(over="ignore"):
        for bit in range(64):
            out |= ((acc[:, bit] > 0).astype(U64)) << U64(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR (Hamming distance of 64-bit fingerprints)."""
    x = (np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64)).view(np.uint8)
    x = x.reshape(-1, 8)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    return lut[x].sum(axis=1).astype(np.int32)
