"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages — the same stage shape as the
bi-encoder embedder (reference T1, ``utils/embeddings.py:55-175``).

Codecs: ``decoder="real"`` decodes BMP (24-bit) and baseline JPEG
images, WAV (PCM16) audio, and uncompressed-DIB AVI video with the
pure-NumPy parsers in :mod:`mel_ray.functions.codecs` /
:mod:`mel_ray.functions.jpeg` — no external libraries; further
compressed formats (H.264/MP3/...) would plug into the same
``_decode_one`` / demux call sites.  ``decoder="fake"`` keeps the
deterministic content-derived pseudo decode used by the oracle-less
driver queries (stable across codec changes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
            from ..functions import codecs

            if kind == "image":
                img = codecs.decode_image(payload)  # BMP or baseline JPEG
                # luma signal, stride-capped to bound the basis matmul
                sig = img.astype(np.float32).mean(axis=2).reshape(-1)
                stride = max(1, len(sig) // 4096)
                return sig[::stride]
            if kind == "audio":
                samples, _ = codecs.decode_wav(payload)
                sig = samples.astype(np.float32).mean(axis=1)
                stride = max(1, len(sig) // 4096)
                return sig[::stride]
            # video: per-frame mean luma — one signal sample per frame
            frames, _ = codecs.decode_avi(payload)
            return frames.astype(np.float32).mean(axis=(1, 2, 3))
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


class MediaResizer:
    """Actor-pool resize stage (images): payload -> resized payload +
    updated width/height metadata.  ``decoder="real"`` decodes BMP,
    nearest-neighbor-resizes in NumPy, and re-encodes BMP; the fake path
    deterministically stride-subsamples the byte payload to the target
    pixel budget so schema/metadata plumbing stays testable for
    non-BMP payloads."""

    def __init__(self, target_w: int = 64, target_h: int = 64, decoder: str = "fake"):
        self.tw, self.th = target_w, target_h
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        budget = self.tw * self.th
        out = []
        if self.decoder == "real":
            from ..functions import codecs

            for i in range(len(batch)):  # per-media codec call is per-row
                buf = payloads[i].as_buffer()
                img = codecs.decode_image(buf)  # BMP or baseline JPEG
                out.append(
                    codecs.encode_image_like(
                        codecs.resize_nearest(img, self.tw, self.th), buf
                    )
                )
            n = len(batch)
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "payload": pa.array(out, pa.large_binary()),
                    "width": pa.array(np.full(n, self.tw, dtype=np.int32)),
                    "height": pa.array(np.full(n, self.th, dtype=np.int32)),
                    "sample_rate": batch["sample_rate"],
                }
            )
        for i in range(len(batch)):  # per-media codec call is per-row
            raw = np.frombuffer(payloads[i].as_buffer(), dtype=np.uint8)
            stride = max(1, len(raw) // budget)
            out.append(raw[::stride][:budget].tobytes())
        n = len(batch)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array(np.full(n, self.tw, dtype=np.int32)),
                "height": pa.array(np.full(n, self.th, dtype=np.int32)),
                "sample_rate": batch["sample_rate"],
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (video): payload -> one row per
    sampled frame (flat_map row expansion, M4 shape).  ``decoder="real"``
    demuxes AVI (uncompressed DIB or Motion-JPEG) and re-encodes each
    sampled frame as a standalone BMP payload; the fake path treats the
    payload as ``n_frames`` equal chunks and emits every ``step``-th
    chunk."""

    def __init__(self, n_frames: int = 16, step: int = 4, decoder: str = "fake"):
        self.n_frames, self.step = n_frames, step
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            from ..functions import codecs

            payloads = batch["payload"]
            if isinstance(payloads, pa.ChunkedArray):
                payloads = payloads.combine_chunks()
            row_of, fidx, out = [], [], []
            for i in range(len(batch)):  # demux is inherently per-row
                frames, _ = codecs.decode_avi(payloads[i].as_buffer())
                for f in range(0, min(len(frames), self.n_frames), self.step):
                    row_of.append(i)
                    fidx.append(f)
                    out.append(codecs.encode_bmp(frames[f]))
            take = pa.array(np.asarray(row_of, dtype=np.int64))
            return pa.table(
                {
                    "media_id": pc.take(batch["media_id"], take),
                    "kind": pc.take(batch["kind"], take),
                    "frame_index": pa.array(np.asarray(fidx, np.int32)),
                    "frame": pa.array(out, pa.large_binary()),
                }
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        # per-row frame counts, then one take/repeat gather for the id
        # columns — only the chunk slicing is inherently per-row
        plens = np.array([len(payloads[i].as_buffer()) for i in range(len(batch))])
        clens = np.maximum(plens // self.n_frames, 1)
        sample_idx = np.arange(0, self.n_frames, self.step)
        n_emitted = np.minimum(
            (plens[:, None] > sample_idx[None, :] * clens[:, None]).sum(axis=1),
            len(sample_idx),
        )
        row_of = np.repeat(np.arange(len(batch)), n_emitted)
        fidx = np.concatenate(
            [sample_idx[:k] for k in n_emitted]
        ) if len(batch) else np.empty(0, np.int64)
        frames = [
            payloads[int(i)].as_buffer()[int(f * clens[i]) : int((f + 1) * clens[i])]
            for i, f in zip(row_of, fidx)
        ]
        take = pa.array(row_of)
        return pa.table(
            {
                "media_id": pc.take(batch["media_id"], take),
                "kind": pc.take(batch["kind"], take),
                "frame_index": pa.array(fidx.astype(np.int32)),
                "frame": pa.array([bytes(b) for b in frames], pa.large_binary()),
            }
        )


def resize_media(media: "ray.data.Dataset", target_w: int = 64, target_h: int = 64,
                 batch_size: int = 64, concurrency: int = 2) -> "ray.data.Dataset":
    return media.map_batches(
        MediaResizer, fn_constructor_args=(target_w, target_h),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency, num_cpus=0.5,
    )


def sample_frames(media: "ray.data.Dataset", n_frames: int = 16, step: int = 4,
                  batch_size: int = 64, concurrency: int = 2) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampler, fn_constructor_args=(n_frames, step),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency, num_cpus=0.5,
    )


class AudioSpectrogram:
    """Actor-pool stage: WAV payload -> banded log-mel-style spectrogram
    summary (REAL decode + REAL FFT, no stub).  Per actor: the Hann
    window and band-edge tables are built once in ``__init__`` (T2);
    per batch: each audio row is framed (``win``/``hop``), windowed,
    rfft'd, and the power spectrum pooled into ``n_bands`` log-spaced
    bands.  Emits per-media (n_frames, duration_sec, band_energy[list])
    with the time axis mean-pooled — the fixed-size descriptor a
    downstream audio-dedup or quality gate would consume."""

    def __init__(self, n_bands: int = 16, win: int = 256, hop: int = 128):
        self.n_bands, self.win, self.hop = n_bands, win, hop
        self.window = np.hanning(win).astype(np.float64)
        # log-spaced band START bins (built once per actor): nondecreasing,
        # all < nbins — reduceat tolerates repeated starts (empty band ->
        # the single bin at that start), so tiny windows stay valid
        nbins = win // 2 + 1
        starts = np.round(np.geomspace(1, nbins - 1, n_bands)).astype(np.int64)
        self.starts = np.maximum.accumulate(np.clip(starts, 1, nbins - 1))

    def _spectrogram(self, samples: np.ndarray) -> tuple[int, np.ndarray]:
        sig = samples.astype(np.float64).mean(axis=1) / 32768.0
        if len(sig) < self.win:
            sig = np.pad(sig, (0, self.win - len(sig)))
        n_frames = 1 + (len(sig) - self.win) // self.hop
        idx = np.arange(self.win)[None, :] + self.hop * np.arange(n_frames)[:, None]
        frames = sig[idx] * self.window
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        bands = np.add.reduceat(power, self.starts, axis=1)
        return n_frames, np.log1p(bands.mean(axis=0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import codecs

        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        n = len(batch)
        out_frames = np.zeros(n, dtype=np.int64)
        out_dur = np.zeros(n, dtype=np.float64)
        out_bands = np.zeros((n, self.n_bands), dtype=np.float64)
        for i in range(n):  # per-media decode is inherently per-row
            samples, rate = codecs.decode_wav(
                memoryview(payloads[i].as_buffer())
            )
            out_frames[i], out_bands[i] = self._spectrogram(samples)
            out_dur[i] = len(samples) / max(rate, 1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_frames": pa.array(out_frames),
                "duration_sec": pa.array(np.round(out_dur, 6)),
                "band_energy": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.round(out_bands, 6).reshape(-1)), self.n_bands
                ),
            }
        )


class ShotDetector:
    """Actor-pool stage: AVI payload -> shot-boundary count via mean
    absolute luma difference between consecutive REAL-decoded frames
    (threshold on the 0-255 luma scale).  The frame-difference detector
    every video-dedup/sampling pipeline starts from."""

    def __init__(self, threshold: float = 24.0):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import codecs

        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        n = len(batch)
        nf = np.zeros(n, dtype=np.int64)
        shots = np.zeros(n, dtype=np.int64)
        fps_out = np.zeros(n, dtype=np.int64)
        for i in range(n):  # per-media demux is inherently per-row
            frames, fps = codecs.decode_avi(memoryview(payloads[i].as_buffer()))
            luma = frames.astype(np.float64).mean(axis=3)
            diffs = np.abs(np.diff(luma, axis=0)).mean(axis=(1, 2))
            nf[i] = len(frames)
            shots[i] = 1 + int((diffs >= self.threshold).sum()) if len(frames) else 0
            fps_out[i] = fps
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_frames": pa.array(nf),
                "n_shots": pa.array(shots),
                "fps": pa.array(fps_out),
            }
        )


def audio_spectrogram(media: "ray.data.Dataset", n_bands: int = 16,
                      batch_size: int = 64, concurrency: int = 2) -> "ray.data.Dataset":
    """audio rows only -> banded spectrogram summaries (real decode)."""
    audio = media.filter(expr="kind == 'audio'")
    return audio.map_batches(
        AudioSpectrogram, fn_constructor_args=(n_bands,),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency, num_cpus=0.5,
    )


def detect_shots(media: "ray.data.Dataset", threshold: float = 24.0,
                 batch_size: int = 64, concurrency: int = 2) -> "ray.data.Dataset":
    """video rows only -> shot-boundary counts (real decode)."""
    video = media.filter(expr="kind == 'video'")
    return video.map_batches(
        ShotDetector, fn_constructor_args=(threshold,),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency, num_cpus=0.5,
    )


def extract_media_features(
    media: "ray.data.Dataset",
    feature_dim: int = 64,
    batch_size: int = 64,
    concurrency: int = 2,
    decoder: str = "fake",
) -> "ray.data.Dataset":
    """The stage wiring: small batches (large binary rows), actor pool."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(feature_dim, decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        # fractional CPUs: chained media pools must not reserve the whole
        # node (the round-1 actor-pool starvation lesson)
        num_cpus=0.5,
    )


def synth_media_dataset(n: int = 64, seed: int = 7, real_codecs: bool = False) -> "ray.data.Dataset":
    """Deterministic synthetic media table in MEDIA_SCHEMA (for tests and
    the ``media_features`` query; no external data).  With
    ``real_codecs=True``, image rows carry valid BMP / baseline-JPEG /
    PNG payloads, audio rows valid WAV payloads, and video rows valid
    AVI payloads (uncompressed DIB or Motion-JPEG), so ``decoder="real"``
    stages run end-to-end for all three kinds."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    if real_codecs:
        from ..functions import codecs

        payloads = []
        for kind in kinds:
            if kind == "image":
                w, h = int(rng.randint(4, 48)), int(rng.randint(4, 48))
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                pick = rng.rand()
                if pick < 1 / 3:  # a third each: BMP / baseline JPEG / PNG
                    payloads.append(codecs.encode_bmp(img))
                elif pick < 2 / 3:
                    from ..functions.jpeg import encode_jpeg

                    sub = "420" if rng.rand() < 0.5 else "444"
                    payloads.append(encode_jpeg(img, quality=90, subsample=sub))
                else:
                    from ..functions.png import encode_png

                    payloads.append(encode_png(img, filter_type=int(rng.randint(0, 5))))
            elif kind == "audio":
                samples = (rng.randn(int(rng.randint(64, 2048))) * 8192).astype(np.int16)
                payloads.append(codecs.encode_wav(samples, 16000))
            else:
                nf = int(rng.randint(2, 9))
                w, h = int(rng.randint(4, 17)), int(rng.randint(4, 17))
                vid = rng.randint(0, 256, (nf, h, w, 3)).astype(np.uint8)
                codec = "mjpg" if rng.rand() < 0.5 else "dib"  # half Motion-JPEG
                payloads.append(codecs.encode_avi(vid, fps=10, codec=codec))
    else:
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
