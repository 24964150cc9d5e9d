"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages — the same stage shape as the
bi-encoder embedder (reference T1, ``utils/embeddings.py:55-175``).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode step is STUBBED: ``decoder="real"`` raises
``NotImplementedError`` where the library call would go, and the default
``decoder="fake"`` produces a deterministic, content-derived pseudo
decode so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.  Swapping in
a real codec changes ONLY ``_decode_one``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    ``__init__`` loads the "model" once per actor (here: the projection
    seed; in production: the image/audio encoder weights); ``__call__``
    handles one Arrow batch.  Large payloads => small ``batch_size`` so
    batch x concurrency fits worker heaps (the guide's memory rule).
    """

    def __init__(self, feature_dim: int = 64, decoder: str = "fake"):
        self.dim = feature_dim
        self.decoder = decoder
        # deterministic "weights": per-actor identical, seeded constants
        self.seeds = np.arange(1, feature_dim + 1, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        # projection frequencies (the "model"), built once per actor
        self.freqs = ((self.seeds.astype(np.int64) % 97 + 1) / 100.0).astype(np.float64)
        self._basis_cache: dict[int, np.ndarray] = {}

    def _decode_one(self, payload: memoryview, kind: str) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not present in this "
                "environment; plug the codec call here"
            )
        # deterministic fake decode: stride-sampled bytes as the "signal"
        raw = np.frombuffer(payload, dtype=np.uint8)
        if len(raw) == 0:
            return np.zeros(256, dtype=np.float32)
        stride = max(1, len(raw) // 256)
        return raw[::stride][:256].astype(np.float32)

    def _basis(self, n_samples: int) -> np.ndarray:
        """(n_samples, dim) cosine projection basis, cached per signal
        length — one matmul replaces the per-row x per-dim loops."""
        b = self._basis_cache.get(n_samples)
        if b is None:
            t = np.arange(n_samples, dtype=np.float64)
            b = np.cos(np.outer(t, self.freqs))
            self._basis_cache[n_samples] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        n = len(batch)
        feats = np.zeros((n, self.dim), dtype=np.float64)
        lens = np.zeros(n, dtype=np.int64)
        for i in range(n):  # per-media decode is inherently per-row (codec call)
            buf = payloads[i].as_buffer()
            sig = self._decode_one(memoryview(buf), kinds[i])
            lens[i] = len(buf)
            # signal -> features: one matmul against the cached basis
            feats[i] = (sig @ self._basis(len(sig))) / max(len(sig), 1)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / np.maximum(norms, 1e-12)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                # typed metadata rides through the stage (real extractors
                # fill these from the decoded media; here: passthrough)
                "width": batch["width"],
                "height": batch["height"],
                "sample_rate": batch["sample_rate"],
                "payload_len": pa.array(lens),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1).astype(np.float32)), self.dim
                ),
            }
        )


def extract_media_features(
    media: "ray.data.Dataset",
    feature_dim: int = 64,
    batch_size: int = 64,
    concurrency: int = 2,
) -> "ray.data.Dataset":
    """The stage wiring: small batches (large binary rows), actor pool."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(feature_dim,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_dataset(n: int = 64, seed: int = 7) -> "ray.data.Dataset":
    """Deterministic synthetic media table in MEDIA_SCHEMA (for tests and
    the ``media_features`` query; no external data)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    payloads = [rng.bytes(int(rng.randint(256, 4096))) for _ in range(n)]
    tbl = pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(rng.randint(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.randint(16, 512, n).astype(np.int32)),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype(np.int32)),
        }
    )
    # >= 2 blocks so a concurrency-2 actor pool actually fills
    return ray.data.from_arrow(tbl).repartition(2)
