"""Encoder factory + pooling wrappers (T2 — the real-model plug point).

Mirrors the reference's ``ModelBuilder`` (``src/utils/model_builder.py:
23-69``: load model -> wrap with a pooling head -> enforce output dim)
and its pooling wrappers (``src/models/pooling_wrappers.py:5-50``:
PoolerOutput / CLS / SentenceTransformer mean-pooling), re-expressed
for the Ray actor-pool stage: :func:`build_encoder` resolves a FACTORY
(dotted import path, so the spec ships to actors as a plain string and
each actor constructs its own model once in ``__init__`` — weights are
never pickled through the task graph), wraps it in the configured
pooling head, and enforces the output dim with a deterministic
projection (the ChangeDimWrapper analogue).

A "model" here is any callable ``(input_ids int [n, L], attention_mask
[n, L]) -> float32 [n, L, d]`` (token-level states).  This sandbox has
no torch/transformers, so the shipped factory is :func:`bag_encoder` —
a deterministic hash-seeded embedding table (a fake transformer with
REAL plumbing: shapes, masking, batching, per-actor construction).  A
user with torch plugs their own factory by dotted path; nothing else
changes.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

Model = Callable[[np.ndarray, np.ndarray], np.ndarray]


@dataclass(frozen=True)
class EncoderSpec:
    """Config surface of the plug point (gin-analogue of
    model_builder's model_path/output_type/dim bindings)."""

    factory: str = "mel_ray.state.encoder.bag_encoder"  # dotted path
    pooling: str = "mean"  # mean | cls (pooling_wrappers.py:18-50)
    dim: int | None = None  # None = model's native dim
    kwargs: dict[str, Any] = field(default_factory=dict)


def _resolve(factory: str | Callable[..., Model]) -> Callable[..., Model]:
    if callable(factory):
        return factory
    mod, _, name = factory.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def _mean_pool(states: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """SentenceTransformerWrapper semantics (pooling_wrappers.py:34-50):
    mask-weighted mean over the sequence, then L2 normalize."""
    m = mask[..., None].astype(np.float32)
    summed = (states * m).sum(axis=1)
    counts = np.clip(m.sum(axis=1), 1e-9, None)
    emb = summed / counts
    norms = np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9, None)
    return (emb / norms).astype(np.float32)


def _cls_pool(states: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """CLSWrapper semantics (pooling_wrappers.py:26-31): position 0."""
    return states[:, 0, :].astype(np.float32)


_POOLERS = {"mean": _mean_pool, "cls": _cls_pool}


def _dim_projection(d_in: int, d_out: int) -> np.ndarray:
    """Deterministic (seeded) linear head — ChangeDimWrapper analogue."""
    rng = np.random.RandomState(0xC0FFEE % (d_in * d_out + 7))
    return (rng.standard_normal((d_in, d_out)) / np.sqrt(d_in)).astype(np.float32)


def build_encoder(spec: EncoderSpec) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """ModelBuilder.build analogue: factory -> pooling -> dim enforce.
    Returns ``(input_ids, attention_mask) -> float32 [n, dim]``.
    Call ONCE per actor (in ``__init__``), never per batch."""
    model = _resolve(spec.factory)(**spec.kwargs)
    try:
        pool = _POOLERS[spec.pooling]
    except KeyError:
        raise ValueError(
            f"invalid pooling {spec.pooling!r}; valid: {sorted(_POOLERS)}"
        ) from None

    proj: np.ndarray | None = None

    def encode(input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        nonlocal proj
        states = model(input_ids, attention_mask)
        emb = pool(states, attention_mask)
        if spec.dim is not None and emb.shape[1] != spec.dim:
            if proj is None:
                proj = _dim_projection(emb.shape[1], spec.dim)
            emb = emb @ proj
        return emb

    return encode


# ---------------------------------------------------------------------------
# the shipped (deterministic, torch-free) model factory
# ---------------------------------------------------------------------------


def bag_encoder(dim: int = 64) -> Model:
    """Embedding-table "model": token id -> a fixed splitmix64-seeded
    vector, token-level output [n, L, dim].  Deterministic across
    processes (no RNG state), vectorized, and shaped exactly like a
    transformer's last_hidden_state so every pooling head applies."""

    def states(input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        ids = np.asarray(input_ids, dtype=np.uint64)
        # one splitmix64 stream per (token, dim-lane): cheap, stateless
        lanes = np.arange(dim, dtype=np.uint64)
        x = ids[..., None] * np.uint64(0x9E3779B97F4A7C15) + lanes * np.uint64(
            0xBF58476D1CE4E5B9
        )
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        # map to [-1, 1) floats
        return ((x >> np.uint64(11)).astype(np.float64) / 2**52 - 1.0).astype(
            np.float32
        )

    return states
