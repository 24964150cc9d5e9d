"""Mergeable cardinality sketch (HyperLogLog) for distributed
approximate distinct counts.

The exact path (``relational.distinct_count``) shuffles one row per
distinct key; at 100 TB the sketch path keeps a fixed 2^b-byte register
array per group regardless of cardinality, merged associatively — the
classic mergeable-summary contract (Flajolet et al., HyperLogLog).
Public-knowledge constants and corrections only.
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, splitmix64


def hll_partial(hashes: np.ndarray, b: int = 12) -> np.ndarray:
    """uint8[2^b] register array for one batch of uint64 key hashes."""
    m = 1 << b
    reg = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    h = np.asarray(hashes, dtype=U64)
    idx = (h >> np.uint64(64 - b)).astype(np.int64)
    rest = (h << np.uint64(b)) | np.uint64((1 << b) - 1)  # sentinel low bits
    # rank = leading zeros of the remaining 64-b bits, + 1 (vectorized
    # shift loop; iterations bounded by the max rank actually present,
    # ~log2(batch) in practice)
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    mask_hi = np.uint64(1) << np.uint64(63)
    active = np.ones(len(h), dtype=bool)
    for _ in range(64 - b):
        active &= (cur & mask_hi) == 0
        if not active.any():
            break
        lz[active] += 1
        cur[active] = cur[active] << np.uint64(1)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.power(2.0, -reg.astype(np.float64))))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return est


def hash_keys(values: np.ndarray) -> np.ndarray:
    """uint64 hashes of an int64 key column."""
    with np.errstate(over="ignore"):
        return splitmix64(np.asarray(values).astype(U64, copy=False))
