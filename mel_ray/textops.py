"""Text-analysis and deduplication operators over the ``documents`` table
(the training-data-pipeline operator family: language ID, quality
scoring, token counting, fingerprinting, exact/near dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from .config import BlockingConfig
from .functions import textstats as TS
from .functions.hashing import U64
from .functions.minhash import band_keys, estimate_jaccard, minhash_signature
from .functions.shingles import word_ngram_hashes
from .functions.simhash import simhash64
from .stages.blocking import _emit_pairs_for_bucket, dedup_pairs


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_exact_dedup(sf_dir: str):
    """first (min doc_id) per distinct text — exact dedup made
    deterministic under a shuffle (T3 ``OnlyOnceDataset`` recast,
    only_once_dataset.py:8-23: per-worker set -> grouped min)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        from .functions.hashing import sha256_hex

        return pa.table({"doc_id": t["doc_id"], "text_sha": sha256_hex(t["text"])})

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_sha")
        .min("doc_id")
        .map_batches(
            lambda t: t.rename_columns(["text_sha", "doc_id"]).select(["doc_id", "text_sha"]),
            batch_format="pyarrow",
        )
    )


def doc_token_count(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(TS.token_count(t["text"]), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def doc_quality(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        stats = TS.quality_stats(t["text"])
        cols = {"doc_id": t["doc_id"]}
        for k, v in stats.items():
            cols[k] = pc.cast(v, pa.int64()) if k in ("n_chars", "n_words") else v
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def doc_lang_id(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "pred_lang": TS.lang_id(t["text"])}),
        batch_format="pyarrow",
    )


def doc_md5_fingerprint(sf_dir: str):
    """whole-document fingerprint (md5 hex) — the cheap exact-identity
    fingerprint; SQL-mirrored with DuckDB's md5()."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from .functions.hashing import string_array_buffers

        data, offsets = string_array_buffers(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        )
        mv = memoryview(data)
        out = [hashlib.md5(mv[offsets[i] : offsets[i + 1]]).hexdigest() for i in range(len(t))]
        return pa.table({"doc_id": t["doc_id"], "fp_md5": pa.array(out, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_winnow_fingerprint(sf_dir: str):
    """rolling-hash winnowing fingerprint (F7 recast of the reference's
    polynomial rolling hash, only_once_dataset.py:60-85); hex string."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fp = TS.winnow_fingerprint(t["text"]).to_numpy(zero_copy_only=False)
        hexes = [f"{int(v):016x}" for v in fp]
        return pa.table({"doc_id": t["doc_id"], "fp_winnow": pa.array(hexes, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_simhash(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        v, off = word_ngram_hashes(t["text"], n=2)
        sh = simhash64(v, off)
        hexes = [f"{int(x):016x}" for x in sh]
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(hexes, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def _doc_bands(t: pa.Table, cfg: BlockingConfig, ngram: int) -> pa.Table:
    v, off = word_ngram_hashes(t["text"], n=ngram)
    sig = minhash_signature(v, off, cfg.num_hashes)
    _, bh = band_keys(sig, cfg.num_bands)
    rid = np.repeat(t["doc_id"].to_numpy(), cfg.num_bands)
    bucket = (bh % U64(cfg.num_buckets)).astype(np.int32)
    return pa.table(
        {
            "record_id": pa.array(rid),
            "band_hash": pa.array(bh.view(np.int64)),
            "bucket": pa.array(bucket),
        }
    )


def doc_minhash_lsh_pairs(sf_dir: str, ngram: int = 2, threshold: float = 0.5):
    """MinHash-LSH near-duplicate doc pairs with signature-verified
    Jaccard >= threshold (doc_id_a < doc_id_b).

    Same kernels as the flagship blocking stage, applied to word
    n-grams of ``documents.text``; candidates from banded collisions,
    verified by signature agreement (D6)."""
    cfg = BlockingConfig()
    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(lambda t: _doc_bands(t, cfg, ngram), batch_format="pyarrow")
    pairs = (
        bands.groupby("bucket")
        .map_groups(lambda g: _emit_pairs_for_bucket(g, cfg), batch_format="pandas")
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["id_a"], pa.scalar(-1, pa.int64()))).select(
                ["id_a", "id_b"]
            ),
            batch_format="pyarrow",
        )
    )
    pairs = dedup_pairs(pairs, cfg.num_buckets)

    # verify: recompute signatures for the (small) doc set, broadcast, filter
    import ray as _ray

    tbl = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    v, off = word_ngram_hashes(pa.array(tbl.text.tolist()), n=ngram)
    sig = minhash_signature(v, off, cfg.num_hashes)
    index = {int(d): i for i, d in enumerate(tbl.doc_id)}
    ref = _ray.put((sig, index))

    class Verify:
        def __init__(self, ref):
            self.sig, self.index = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["id_a"].to_numpy()
            b = t["id_b"].to_numpy()
            ia = np.array([self.index[int(x)] for x in a], dtype=np.int64)
            ib = np.array([self.index[int(x)] for x in b], dtype=np.int64)
            est = estimate_jaccard(self.sig[ia], self.sig[ib])
            keep = est >= threshold
            return pa.table(
                {
                    "doc_id_a": pa.array(a[keep]),
                    "doc_id_b": pa.array(b[keep]),
                    "est_jaccard": pa.array(np.round(est[keep].astype(np.float64), 4)),
                }
            )

    return pairs.map_batches(Verify, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2)


def doc_length_histogram(sf_dir: str):
    """document length histogram in 100-char buckets (quality telemetry,
    StatisticsLogger analogue A9/T9)."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        bucket = pc.multiply(
            pc.cast(pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), 100.0)), pa.int64()),
            pa.scalar(100, pa.int64()),
        )
        return pa.table({"len_bucket": bucket})

    return ds.map_batches(f, batch_format="pyarrow").groupby("len_bucket").aggregate(
        Count(alias_name="n_docs")
    )
