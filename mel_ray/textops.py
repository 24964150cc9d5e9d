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

    return pairs.map_batches(Verify, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2, num_cpus=0.5)


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


def doc_simhash_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup pairs: Hamming(simhash_a, simhash_b) <= K.

    Distributed by the pigeonhole block trick: split the 64-bit
    fingerprint into 4 x 16-bit chunks; any pair within Hamming <= 3*... 
    a pair at distance <= K with K < chunks must agree on >= 1 chunk, so
    grouping by (chunk_id, chunk_value) yields a complete candidate set
    for small K; candidates are then verified exactly.  (Charikar
    simhash + Manku-et-al chunk blocking.)"""
    import ray as _ray
    from ray.data.aggregate import Count as _Count

    ds = _docs(sf_dir, ["doc_id", "text"])

    def fingerprints(t: pa.Table) -> pa.Table:
        v, off = word_ngram_hashes(t["text"], n=2)
        sh = simhash64(v, off)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(sh.view(np.int64))})

    fps = ds.map_batches(fingerprints, batch_format="pyarrow")

    def expand(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy().view(np.uint64)
        did = t["doc_id"].to_numpy()
        chunks = []
        ids = []
        cidx = []
        for c in range(4):
            chunk = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            chunks.append(chunk)
            ids.append(did)
            cidx.append(np.full(len(did), c, dtype=np.int64))
        key = np.concatenate(cidx) * (1 << 16) + np.concatenate(chunks)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids)),
                "band_hash": pa.array(key),
                "bucket": pa.array((key % 16).astype(np.int32)),
            }
        )

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        bh = group["band_hash"].to_numpy()
        rid = group["doc_id"].to_numpy()
        order = np.lexsort((rid, bh))
        bh, rid = bh[order], rid[order]
        change = np.flatnonzero(np.diff(bh) != 0) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(bh)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            mem = np.unique(rid[s:e])
            if len(mem) < 2:
                continue
            iu, ju = np.triu_indices(len(mem), k=1)
            out_a.append(mem[iu])
            out_b.append(mem[ju])
        if not out_a:
            return pd.DataFrame({"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    cands = (
        fps.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
    )
    cands = dedup_pairs(cands, 16)

    fp_tbl = fps.to_pandas()
    fp_map = dict(zip(fp_tbl.doc_id.astype(int), fp_tbl.simhash.astype(np.int64)))
    ref = _ray.put(fp_map)

    class VerifyHamming:
        def __init__(self, ref):
            self.fp = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from .functions.simhash import hamming64

            a = t["id_a"].to_numpy()
            b = t["id_b"].to_numpy()
            fa = np.array([self.fp[int(x)] for x in a], dtype=np.int64).view(np.uint64)
            fb = np.array([self.fp[int(x)] for x in b], dtype=np.int64).view(np.uint64)
            d = hamming64(fa, fb)
            keep = d <= max_hamming
            return pa.table(
                {
                    "doc_id_a": pa.array(a[keep]),
                    "doc_id_b": pa.array(b[keep]),
                    "hamming": pa.array(d[keep].astype(np.int64)),
                }
            )

    return cands.map_batches(VerifyHamming, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2, num_cpus=0.5)


def doc_ngram_jaccard_pairs(sf_dir: str, n: int = 2, threshold: float = 0.3):
    """EXACT word-n-gram Jaccard near-dup pairs (doc_id_a < doc_id_b,
    jaccard rounded 4): LSH banding proposes candidates, exact set
    Jaccard verifies — the candidate-then-verify composition the
    flagship uses, with an exact (not estimated) verifier."""
    import ray as _ray

    pairs = doc_minhash_lsh_pairs(sf_dir, ngram=n, threshold=0.15)

    tbl = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    v, off = word_ngram_hashes(pa.array(tbl.text.tolist()), n=n)
    sets = {
        int(d): frozenset(v[off[i] : off[i + 1]].tolist()) for i, d in enumerate(tbl.doc_id)
    }
    ref = _ray.put(sets)

    class ExactJaccard:
        def __init__(self, ref):
            self.sets = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["doc_id_a"].to_numpy()
            b = t["doc_id_b"].to_numpy()
            out_a, out_b, out_j = [], [], []
            for x, y in zip(a, b):
                sa, sb = self.sets[int(x)], self.sets[int(y)]
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= threshold:
                    out_a.append(int(x))
                    out_b.append(int(y))
                    out_j.append(round(j, 4))
            return pa.table(
                {
                    "doc_id_a": pa.array(np.asarray(out_a, np.int64)),
                    "doc_id_b": pa.array(np.asarray(out_b, np.int64)),
                    "jaccard": pa.array(np.asarray(out_j, np.float64)),
                }
            )

    return pairs.map_batches(ExactJaccard, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2, num_cpus=0.5)
