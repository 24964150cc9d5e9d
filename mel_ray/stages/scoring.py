"""Pairwise scoring stage: attach per-record features to candidate
pairs (hash-shuffle joins), then score each pair in an actor pool.

Recast of the reference's retrieval scoring — the bi-encoder embed +
dot-product search (``src/utils/embeddings.py:55-175``,
``src/models/searchers/brute_force_searcher.py:28-36``) — as *pairwise*
scoring inside LSH blocks: no global k-NN index exists at corpus scale;
model state (here: the deterministic hashed-ngram encoder config) lives
in the actor (loaded once in ``__init__``, reference pattern T1/T2).

Features attach via two hash-partitioned joins on ``record_id``
(``Dataset.join``; SURVEY.md §7.3 "feature join").  The pair batch then
scores fully vectorized: signature-slot agreement (MinHash Jaccard
estimate), embedding cosine, Jaro-Winkler + Levenshtein on path/repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import BlockingConfig, ScoringConfig
from ..functions.embed import cosine_pairs
from ..functions.minhash import estimate_jaccard
from ..functions.strsim import jaro_winkler, levenshtein_ratio


def _rename(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# Shuffle-join aggregator actors reserve fractional CPUs so that several
# join stages plus an actor pool can coexist on a small node without
# resource deadlock (each Dataset.join spawns num_partitions aggregators).
JOIN_AGG_ARGS = {"num_cpus": 0.25}


def attach_features(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    num_partitions: int,
) -> "ray.data.Dataset":
    """pairs(id_a, id_b) ⋈ features twice -> scored-pair input rows.

    The two hash-shuffle joins are separated by a materialize boundary:
    chaining them in one streaming plan would run 2×num_partitions
    aggregator actors concurrently and can starve the cluster.
    """
    fa = _rename(
        features,
        {"record_id": "id_a", "repo": "repo_a", "path": "path_a", "sig": "sig_a", "emb": "emb_a"},
    )
    fb = _rename(
        features,
        {"record_id": "id_b", "repo": "repo_b", "path": "path_b", "sig": "sig_b", "emb": "emb_b"},
    )
    j1 = pairs.join(
        fa,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    ).materialize()
    j2 = j1.join(
        fb,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )
    return j2


class PairScorer:
    """Actor-pool pair scorer (stateful stage, reference pattern T1:
    model/state loaded once per actor in ``__init__``, work per batch in
    ``__call__`` — ``map_batches(PairScorer, concurrency=N)``)."""

    def __init__(self, scoring: ScoringConfig, blocking: BlockingConfig):
        self.cfg = scoring
        self.num_hashes = blocking.num_hashes
        self.dim = scoring.embed_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.blocking import binary_matrix

        sig_a = binary_matrix(batch["sig_a"], np.uint64)
        sig_b = binary_matrix(batch["sig_b"], np.uint64)
        emb_a = binary_matrix(batch["emb_a"], np.float32)
        emb_b = binary_matrix(batch["emb_b"], np.float32)
        est_j = estimate_jaccard(sig_a, sig_b)
        cos = cosine_pairs(emb_a, emb_b)
        path_jw = jaro_winkler(self._col(batch, "path_a"), self._col(batch, "path_b"))
        path_lev = levenshtein_ratio(self._col(batch, "path_a"), self._col(batch, "path_b"))
        repo_jw = jaro_winkler(self._col(batch, "repo_a"), self._col(batch, "repo_b"))
        score = (0.6 * est_j + 0.3 * np.maximum(cos, 0) + 0.05 * path_jw + 0.05 * repo_jw).astype(
            np.float32
        )
        accepted = (est_j >= self.cfg.jaccard_accept) & (cos >= self.cfg.cosine_accept)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "est_jaccard": pa.array(est_j),
                "cosine": pa.array(cos),
                "path_jw": pa.array(path_jw),
                "path_lev": pa.array(path_lev),
                "repo_jw": pa.array(repo_jw),
                "score": pa.array(score),
                "accepted": pa.array(accepted),
            }
        )

    @staticmethod
    def _col(batch: pa.Table, name: str) -> pa.Array:
        c = batch[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def score_pairs(
    pairs_with_features: "ray.data.Dataset",
    scoring: ScoringConfig,
    blocking: BlockingConfig,
) -> "ray.data.Dataset":
    from ..util import auto_pool_size

    return pairs_with_features.map_batches(
        PairScorer,
        fn_constructor_args=(scoring, blocking),
        batch_format="pyarrow",
        batch_size=scoring.batch_size,
        concurrency=auto_pool_size(scoring.concurrency),
        num_cpus=1,
    )
