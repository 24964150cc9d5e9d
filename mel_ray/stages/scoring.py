"""Pairwise scoring: a two-phase cascade over candidate pairs.

Recast of the reference's retrieval scoring — bi-encoder embed +
dot-product search (``src/utils/embeddings.py:55-175``,
``src/models/searchers/brute_force_searcher.py:28-36``) — as *pairwise*
scoring inside LSH blocks, structured as a cascade so the expensive
features only travel for plausible pairs:

1. **verify**: join the compact uint32 MinHash signatures (512 B/side)
   onto candidate pairs, estimate Jaccard from slot agreement, and drop
   pairs below the accept threshold — this kills the hot-band
   (license/boilerplate) collisions, which dominate the candidate set;
2. **score**: join embeddings + path/repo strings onto the survivors
   only, then an actor-pool scorer computes cosine and
   Jaro-Winkler/Levenshtein similarities and the final accept bit.

All joins are hash-shuffle ``Dataset.join`` on ``record_id`` with
fractional-CPU aggregators (several join stages + an actor pool must
coexist on one node without starving).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import BlockingConfig, ScoringConfig
from ..functions.embed import cosine_pairs
from ..functions.strsim import jaro_winkler, levenshtein_ratio

# Shuffle-join aggregator actors reserve fractional CPUs so that several
# join stages plus an actor pool can coexist on a small node without
# resource deadlock (each Dataset.join spawns num_partitions aggregators).
JOIN_AGG_ARGS = {"num_cpus": 0.25}


def combine_scores(w, est_j, cos, path_jw, repo_jw) -> np.ndarray:
    """Weighted score combination with checkpointable weights (S11).
    ``float(w[i])`` turns each float64 weight back into a Python float,
    so the default weights reproduce the original literal-constant
    expression bit-exactly."""
    return (
        float(w[0]) * est_j
        + float(w[1]) * np.maximum(cos, 0)
        + float(w[2]) * path_jw
        + float(w[3]) * repo_jw
    ).astype(np.float32)


def _gpu_args(scoring: ScoringConfig) -> dict:
    """map_batches kwargs for a GPU-backed scorer pool; empty at
    num_gpus=0 so the CPU-only plan is byte-identical to before."""
    return {"num_gpus": scoring.num_gpus} if scoring.num_gpus else {}


def _rename(ds: "ray.data.Dataset", mapping: dict[str, str], keep: list[str]) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _join(left, right, on, num_partitions, how="inner"):
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )


def verify_candidates(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    scoring: ScoringConfig,
    num_partitions: int,
) -> "ray.data.Dataset":
    """pairs ⋈ sig x2 -> est_jaccard filter (phase 1 of the cascade)."""
    sa = _rename(features, {"record_id": "id_a", "sig": "sig_a"}, ["record_id", "sig"])
    sb = _rename(features, {"record_id": "id_b", "sig": "sig_b"}, ["record_id", "sig"])
    j = _join(pairs, sa, "id_a", num_partitions)
    j = _join(j, sb, "id_b", num_partitions)

    thresh = scoring.jaccard_accept

    def estimate(t: pa.Table) -> pa.Table:
        from ..functions.minhash import estimate_jaccard
        from .blocking import binary_matrix

        sig_a = binary_matrix(t["sig_a"], np.uint32)
        sig_b = binary_matrix(t["sig_b"], np.uint32)
        est = estimate_jaccard(sig_a, sig_b)  # empty-signature pairs -> 0
        keep = est >= thresh
        return pa.table(
            {
                "id_a": pa.array(t["id_a"].to_numpy()[keep]),
                "id_b": pa.array(t["id_b"].to_numpy()[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return j.map_batches(estimate, batch_format="pyarrow", zero_copy_batch=True)


def attach_features(
    verified: "ray.data.Dataset",
    features: "ray.data.Dataset",
    num_partitions: int,
) -> "ray.data.Dataset":
    """survivors ⋈ (repo, path, emb) x2 (phase 2 of the cascade)."""
    fa = _rename(
        features,
        {"record_id": "id_a", "repo": "repo_a", "path": "path_a", "emb": "emb_a"},
        ["record_id", "repo", "path", "emb"],
    )
    fb = _rename(
        features,
        {"record_id": "id_b", "repo": "repo_b", "path": "path_b", "emb": "emb_b"},
        ["record_id", "repo", "path", "emb"],
    )
    j = _join(verified, fa, "id_a", num_partitions)
    return _join(j, fb, "id_b", num_partitions)


class PairScorer:
    """Actor-pool pair scorer (stateful stage, reference pattern T1:
    model/state loaded once per actor in ``__init__``, work per batch in
    ``__call__`` — ``map_batches(PairScorer, concurrency=N)``)."""

    def __init__(self, scoring: ScoringConfig, blocking: BlockingConfig):
        from ..state.model_ckpt import scorer_weights

        self.cfg = scoring
        self.num_hashes = blocking.num_hashes
        self.w = scorer_weights(scoring)  # model state, loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .blocking import binary_matrix

        emb_a = binary_matrix(batch["emb_a"], np.float16).astype(np.float32)
        emb_b = binary_matrix(batch["emb_b"], np.float16).astype(np.float32)
        est_j = batch["est_jaccard"].to_numpy()
        cos = cosine_pairs(emb_a, emb_b)
        path_jw = jaro_winkler(self._col(batch, "path_a"), self._col(batch, "path_b"))
        path_lev = levenshtein_ratio(
            self._col(batch, "path_a"), self._col(batch, "path_b"), max_len=64
        )
        repo_jw = jaro_winkler(self._col(batch, "repo_a"), self._col(batch, "repo_b"))
        score = combine_scores(self.w, est_j, cos, path_jw, repo_jw)
        accepted = (est_j >= self.cfg.jaccard_accept) & (cos >= self.cfg.cosine_accept)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "est_jaccard": pa.array(est_j.astype(np.float32)),
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
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    scoring: ScoringConfig,
    blocking: BlockingConfig,
    num_partitions: int,
) -> "ray.data.Dataset":
    """The full cascade: verify -> attach -> actor-pool scorer."""
    from ..util import auto_pool_size

    verified = verify_candidates(pairs, features, scoring, num_partitions).materialize()
    enriched = attach_features(verified, features, num_partitions)
    return enriched.map_batches(
        PairScorer,
        fn_constructor_args=(scoring, blocking),
        batch_format="pyarrow",
        batch_size=scoring.batch_size,
        concurrency=auto_pool_size(scoring.concurrency),
        num_cpus=1,
        **_gpu_args(scoring),
    )


# ---------------------------------------------------------------------------
# Broadcast fast path: when the feature table fits comfortably in the object
# store (<= ScoringConfig.broadcast_limit_rows), ship it ONCE via ray.put and
# score pairs with zero shuffle — the map-side join the reference uses for its
# qid-remap table (src/utils/qids_remap.py:35-55) and Spark's
# autoBroadcastJoinThreshold strategy.  Above the threshold the partitioned
# Dataset.join cascade above is used instead (the 10^12-row scale path).
# ---------------------------------------------------------------------------


def _assemble_features(*tables):
    """(worker task) feature blocks -> (ids_sorted, sig, emb, repo, path)."""
    from .blocking import binary_matrix

    t = pa.concat_tables(tables).combine_chunks()
    ids = t["record_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    take = pa.array(order)
    sig = binary_matrix(t["sig"].combine_chunks(), np.uint32)[order]
    emb = binary_matrix(t["emb"].combine_chunks(), np.float16)[order]
    repo = pc.take(t["repo"].combine_chunks(), take)
    path = pc.take(t["path"].combine_chunks(), take)
    return ids, np.ascontiguousarray(sig), np.ascontiguousarray(emb), repo, path


def _collect_features_ref(features: "ray.data.Dataset"):
    """Broadcast-table ref WITHOUT driver materialization: the feature
    blocks flow from the object store into one assembly TASK whose
    return value is the broadcast object — the driver only ever holds
    the ref (the qid-remap table pattern at honest scale)."""
    import ray as _ray

    refs = features.to_arrow_refs()
    # fractional CPU: the assemble task must be schedulable WHILE the
    # scorer actors (whose __init__ blocks on its output) hold their
    # reservations — at num_cpus=2 a full-CPU task here deadlocks the
    # whole stage (see the fractional-cpu rule on JOIN_AGG_ARGS)
    assemble = _ray.remote(num_returns=1, num_cpus=0.25)(_assemble_features)
    return assemble.remote(*refs)


class BroadcastPairScorer:
    """Actor-pool scorer holding the broadcast feature table: per pair
    batch, searchsorted id lookup + the same kernels as PairScorer."""

    def __init__(self, ref, scoring: ScoringConfig):
        import ray as _ray

        from ..state.model_ckpt import scorer_weights

        self.ids, self.sig, self.emb, self.repo, self.path = _ray.get(ref)
        self.cfg = scoring
        self.w = scorer_weights(scoring)  # model state, loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.minhash import estimate_jaccard

        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        est_j = estimate_jaccard(self.sig[ia], self.sig[ib])  # empty sigs -> 0
        keep = est_j >= self.cfg.jaccard_accept
        ia, ib, est_j = ia[keep], ib[keep], est_j[keep]
        emb_a = self.emb[ia].astype(np.float32)
        emb_b = self.emb[ib].astype(np.float32)
        cos = cosine_pairs(emb_a, emb_b)
        take_a, take_b = pa.array(ia), pa.array(ib)
        path_a, path_b = pc.take(self.path, take_a), pc.take(self.path, take_b)
        repo_a, repo_b = pc.take(self.repo, take_a), pc.take(self.repo, take_b)
        path_jw = jaro_winkler(path_a, path_b)
        path_lev = levenshtein_ratio(path_a, path_b, max_len=64)
        repo_jw = jaro_winkler(repo_a, repo_b)
        score = combine_scores(self.w, est_j, cos, path_jw, repo_jw)
        accepted = (est_j >= self.cfg.jaccard_accept) & (cos >= self.cfg.cosine_accept)
        return pa.table(
            {
                "id_a": pa.array(batch["id_a"].to_numpy()[keep]),
                "id_b": pa.array(batch["id_b"].to_numpy()[keep]),
                "est_jaccard": pa.array(est_j),
                "cosine": pa.array(cos),
                "path_jw": pa.array(path_jw),
                "path_lev": pa.array(path_lev),
                "repo_jw": pa.array(repo_jw),
                "score": pa.array(score),
                "accepted": pa.array(accepted),
            }
        )


def score_pairs_broadcast(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    scoring: ScoringConfig,
) -> "ray.data.Dataset":
    from ..util import cluster_cpus

    ref = _collect_features_ref(features)
    # the broadcast path has NO co-running join aggregators (that is the
    # point), so the scorer pool can take 3/4 of the machine instead of
    # the conservative quarter the partitioned cascade leaves for Acero
    # aggregator actors (see the deadlock note on auto_pool_size); the
    # remaining quarter keeps the feeding repartition tasks schedulable
    # (measured at sf0.1/32cpu: pool 24 beats 16 on both of two samples)
    pool = scoring.concurrency or max(2, cluster_cpus() * 3 // 4)
    # an actor-pool task = one input block; the band groupby hands over
    # ~num_buckets skewed blocks, so a straggler block sets the stage
    # tail.  A split-only repartition to 4 tasks/actor evens the packing
    # (measured: 894ms–3.2s per block before, ~1s stage tail saved).
    # num_cpus=0.5: the pool's RESERVATION must leave room for the
    # assemble task + repartition tasks even at tiny clusters (2 actors
    # x 1.0 cpu on a 2-cpu cluster deadlocks: __init__ blocks on the
    # assemble task which then has no slot).  The actors still occupy
    # whole cores when running — reservation is scheduling accounting.
    return pairs.repartition(pool * 4).map_batches(
        BroadcastPairScorer,
        fn_constructor_args=(ref, scoring),
        batch_format="pyarrow",
        batch_size=scoring.batch_size * 4,
        concurrency=pool,
        num_cpus=0.5,
        **_gpu_args(scoring),
    )


def score_pairs_auto(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    scoring: ScoringConfig,
    blocking: BlockingConfig,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Join-strategy selection: broadcast when the feature side is small
    (features is materialized by the stage checkpointer, so count() is a
    metadata read), partitioned cascade otherwise."""
    n = features.count()
    if n <= scoring.broadcast_limit_rows:
        return score_pairs_broadcast(pairs, features, scoring)
    return score_pairs(pairs, features, scoring, blocking, num_partitions)
