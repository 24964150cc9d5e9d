"""Deterministic hashed char-n-gram bi-encoder.

Stands in for the reference's HF transformer bi-encoder
(``src/utils/embeddings.py:55-175``, ``src/utils/model_builder.py:23-69``)
with a deterministic, dependency-free encoder: feature-hashed character
n-gram counts with a signed hashing trick, L2-normalized — the classic
"hashing trick" text embedding.  Cosine similarity of these vectors
tracks lexical overlap, which is what the pairwise scorer needs; the
encoder is loaded once per actor (weights := the seed constants), so the
Ray-side plumbing (actor-pool ``map_batches`` stage, batched matmul
scoring) is identical to what a real model would use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import U64, string_array_buffers
from .shingles import char_kgram_hashes

DEFAULT_DIM = 256
DEFAULT_K = 4


def embed_strings(
    arr: pa.Array | pa.ChunkedArray, dim: int = DEFAULT_DIM, k: int = DEFAULT_K
) -> np.ndarray:
    """(N, dim) float32 L2-normalized hashed char-k-gram embeddings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, offsets = string_array_buffers(arr)
    n = len(offsets) - 1
    if n == 0:
        return np.empty((0, dim), dtype=np.float32)
    values, out_off = char_kgram_hashes(data, offsets, k)
    counts = (out_off[1:] - out_off[:-1]).astype(np.int64)
    # flat scatter index: repeat the row base (row*dim), add the bucket
    # in place; power-of-two dims use a mask instead of a u64 division
    flat_idx = np.repeat(np.arange(n, dtype=np.int64) * dim, counts)
    if dim & (dim - 1) == 0:
        bucket = values & U64(dim - 1)
    else:
        bucket = values % U64(dim)
    flat_idx += bucket.astype(np.int64)
    # bincount weights are accumulated in float64 regardless — build the
    # sign there directly (one temp instead of bool+f64+f32 chains)
    sign = ((values >> U64(32)) & U64(1)).astype(np.float64)
    sign *= 2.0
    sign -= 1.0
    mat = np.bincount(flat_idx, weights=sign, minlength=n * dim).reshape(n, dim)
    mat = mat.astype(np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.maximum(norms, 1e-12, out=norms)
    return mat / norms


def cosine_pairs(emb_a: np.ndarray, emb_b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two aligned (P, dim) unit matrices."""
    return np.einsum("ij,ij->i", emb_a, emb_b).astype(np.float32)


def topk_cosine(
    queries: np.ndarray, index: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force top-k by cosine: (Q, k) indices + sims.

    Recast of the reference's ``BruteForceSearcher.find``
    (``src/models/searchers/brute_force_searcher.py:28-36``): one batched
    matmul + argpartition, deterministic ties broken by lower index.
    """
    sims = queries @ index.T  # (Q, N)
    n = index.shape[0]
    k = min(k, n)
    part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
    psims = np.take_along_axis(sims, part, axis=1)
    # stable order: sort by (-sim, idx)
    order = np.lexsort((part, -psims), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    out_sims = np.take_along_axis(psims, order, axis=1)
    # float64 end-to-end: the oracle (DuckDB list_cosine_similarity) is
    # float64; a float32 downcast can flip values across a 5e-5 rounding
    # boundary between the engines.
    return idx, out_sims.astype(np.float64)
