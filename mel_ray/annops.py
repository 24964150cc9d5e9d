"""Similarity-search operators over the ``embeddings`` table.

Recast of the reference's searcher family (T5:
``src/models/searchers/*.py``): brute-force batched matmul top-k as the
exact baseline, an LSH-bucketed variant as the scale path (the
ScaNN-partitioned analogue), plus near-dup pairs and grouped centroids
(A6 ``combine_embs_by_qid``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .functions.embed import topk_cosine


def _emb_table(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    tbl = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = tbl.vec_id.to_numpy(dtype=np.int64)
    labels = tbl.label.to_numpy(dtype=np.int64)
    mat = np.stack(tbl.embedding.to_numpy()).astype(np.float64)
    return ids, labels, mat


def knn_bruteforce(sf_dir: str, k: int = 5, num_queries: int = 20):
    """exact top-k cosine neighbors of the first ``num_queries`` vectors
    (by vec_id), self excluded; ties -> lower vec_id.

    The index is broadcast once via ``ray.put`` (it is the small side);
    each actor holds it and scores its query batch with one matmul —
    ``BruteForceSearcher.find`` recast (brute_force_searcher.py:28-36).
    """
    ids, _, mat = _emb_table(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.maximum(norms, 1e-12)
    index_ref = ray.put((ids, unit, mat, norms[:, 0]))

    qids = ids[:num_queries]
    queries = ray.data.from_arrow(pa.table({"query_id": pa.array(qids)}))

    class Searcher:
        def __init__(self, ref):
            self.ids, self.unit, self.mat, self.norms = ray.get(ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, t: pa.Table) -> pa.Table:
            q = t["query_id"].to_numpy()
            qi = np.array([self.pos[int(x)] for x in q])
            idx, sims = topk_cosine(self.unit[qi], self.unit, k + 1)
            out_q, out_n, out_s = [], [], []
            for row, qq in enumerate(qi):
                cnt = 0
                for j, s in zip(idx[row], sims[row]):
                    if j == qq:
                        continue
                    out_q.append(self.ids[qq])
                    out_n.append(self.ids[j])
                    out_s.append(s)
                    cnt += 1
                    if cnt == k:
                        break
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(out_q, np.int64)),
                    "neighbor_id": pa.array(np.asarray(out_n, np.int64)),
                    "cos_sim": pa.array(np.round(np.asarray(out_s, np.float64), 4)),
                }
            )

    return queries.map_batches(Searcher, fn_constructor_args=(index_ref,), batch_format="pyarrow", concurrency=2, num_cpus=0.5)


def knn_lsh(sf_dir: str, k: int = 5, num_queries: int = 20, num_planes: int = 4, probes: int = 2):
    """LSH-bucketed approximate top-k: random-hyperplane sign buckets +
    multi-probe (flip one plane).  The scale path: the index is
    PARTITIONED by bucket, each query only scores its probed buckets —
    the ScaNN-partitioned-search analogue (scann_searcher.py:6-49).
    Recall vs the brute-force oracle is asserted in tests."""
    ids, _, mat = _emb_table(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(1234)
    planes = rng.randn(unit.shape[1], num_planes)
    codes = (unit @ planes > 0).astype(np.uint32)
    bucket = np.zeros(len(ids), dtype=np.uint32)
    for b in range(num_planes):
        bucket |= codes[:, b] << b
    index_ref = ray.put((ids, unit, bucket, planes))

    qids = ids[:num_queries]
    queries = ray.data.from_arrow(pa.table({"query_id": pa.array(qids)}))

    class LshSearcher:
        def __init__(self, ref):
            self.ids, self.unit, self.bucket, self.planes = ray.get(ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}
            self.by_bucket = {}
            for i, b in enumerate(self.bucket):
                self.by_bucket.setdefault(int(b), []).append(i)
            self.by_bucket = {b: np.asarray(v) for b, v in self.by_bucket.items()}

        def __call__(self, t: pa.Table) -> pa.Table:
            out_q, out_n, out_s = [], [], []
            for x in t["query_id"].to_numpy():
                qi = self.pos[int(x)]
                b = int(self.bucket[qi])
                cand = [self.by_bucket.get(b, np.empty(0, np.int64))]
                for flip in range(self.planes.shape[1]):  # multi-probe: Hamming-1
                    cand.append(self.by_bucket.get(b ^ (1 << flip), np.empty(0, np.int64)))
                cand = np.unique(np.concatenate(cand)).astype(np.int64)
                cand = cand[cand != qi]
                if len(cand) == 0:
                    continue
                sims = self.unit[cand] @ self.unit[qi]
                top = np.lexsort((cand, -sims))[:k]
                for j in top:
                    out_q.append(x)
                    out_n.append(self.ids[cand[j]])
                    out_s.append(sims[j])
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(out_q, np.int64)),
                    "neighbor_id": pa.array(np.asarray(out_n, np.int64)),
                    "cos_sim": pa.array(np.round(np.asarray(out_s, np.float64), 4)),
                }
            )

    return queries.map_batches(
        LshSearcher, fn_constructor_args=(index_ref,), batch_format="pyarrow", concurrency=2, num_cpus=0.5
    )


def emb_near_dupes(sf_dir: str, threshold: float = 0.4):
    """all pairs with cosine >= threshold (vec_id_a < vec_id_b) —
    embedding-cosine near-dup detection.  Distributed as a blocked
    matmul: the unit matrix is broadcast, each task scores a row-slab
    against the full index (O(N^2/W) per task, no Python loops)."""
    ids, _, mat = _emb_table(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    index_ref = ray.put((ids, unit))

    slabs = ray.data.from_arrow(pa.table({"row": pa.array(np.arange(len(ids), dtype=np.int64))}))

    class Slab:
        def __init__(self, ref):
            self.ids, self.unit = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rows = t["row"].to_numpy()
            sims = self.unit[rows] @ self.unit.T  # (slab, N)
            out_a, out_b, out_s = [], [], []
            for r, row in enumerate(rows):
                hit = np.flatnonzero(sims[r] >= threshold)
                hit = hit[hit > row]  # canonical a < b by position == id order
                out_a.extend([self.ids[row]] * len(hit))
                out_b.extend(self.ids[hit].tolist())
                out_s.extend(sims[r][hit].tolist())
            return pa.table(
                {
                    "vec_id_a": pa.array(np.asarray(out_a, np.int64)),
                    "vec_id_b": pa.array(np.asarray(out_b, np.int64)),
                    "cos_sim": pa.array(np.round(np.asarray(out_s, np.float64), 4)),
                }
            )

    return slabs.map_batches(
        Slab, fn_constructor_args=(index_ref,), batch_format="pyarrow", batch_size=512, concurrency=2, num_cpus=0.5
    )


def emb_centroids(sf_dir: str):
    """per-label mean embedding, exploded to (label, dim_i, avg_val) —
    the grouped vector reduce of A6 ``combine_embs_by_qid``
    (combine_embs.py:9-43), partial sums per batch then one small
    groupby."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy()
        mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv)
        dim = mat.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim).astype(np.int64)),
                "dim_i": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.reshape(-1)),
                "c": pa.array(np.repeat(counts, dim).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim_i"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        avg = pc.round(
            pc.divide(t["s"], pc.cast(t["c"], pa.float64())),
            ndigits=4,
            round_mode="half_towards_infinity",
        )
        return pa.table({"label": t["label"], "dim_i": t["dim_i"], "avg_val": avg})

    return agg.map_batches(finalize, batch_format="pyarrow")
