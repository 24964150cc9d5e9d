"""The flagship end-to-end record-linkage pipeline (SURVEY.md §7.0).

    read_parquet(repo, path, commit, lang, content)
      -> ingest      (sha256, record_id, repo canonicalization)  [stateless tasks]
      -> featurize   (minhash sig, hashed-ngram embedding)       [stateless tasks]
      -> blocking    (band expansion -> bucketed groupby pairs)  [hash shuffle]
      -> attach      (pairs ⋈ features x2)                      [shuffle join]
      -> scoring     (actor pool: est-jaccard, cosine, JW/Lev)   [actor pool]
      -> clustering  (star-contraction connected components)     [k x groupby]
      -> clusters.parquet / metrics                              [write]

Every stage streams; only the candidate-edge set (orders of magnitude
smaller than the corpus) is ever materialized, for the CC iteration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow as pa

import ray.data

from ..config import LinkageConfig
from ..stages import blocking as B
from ..stages import clustering as C
from ..stages import ingest as I
from ..stages import scoring as S
from ..state.manifest import StageCheckpointer


def _input_shard_groups(corpus_path: str, max_partitions: int = 16) -> list[list[str]] | None:
    """Group the input's parquet shards into <= max_partitions resume
    units (one unit = one committed partition; grouping amortizes
    per-pipeline scheduling overhead when the input has many shards)."""
    from pathlib import Path

    p = Path(corpus_path)
    if not p.is_dir():
        return None
    shards = sorted(str(f) for f in p.rglob("*.parquet"))
    if len(shards) < 2:
        return None
    n = min(max_partitions, len(shards))
    per = (len(shards) + n - 1) // n
    return [shards[i : i + per] for i in range(0, len(shards), per)]


@dataclass
class LinkageResult:
    clusters: "ray.data.Dataset"          # record_id, cluster_id, repo, path, sha256
    scored_pairs: "ray.data.Dataset"      # id_a, id_b, features..., accepted
    stats: dict[str, Any]


def run_linkage(
    corpus_path: str,
    cfg: LinkageConfig | None = None,
    renames: dict[str, str] | None = None,
) -> LinkageResult:
    cfg = cfg or LinkageConfig()
    from ..util import auto_join_partitions, shuffle_partitions

    # Push-based (pipelined, merge-factor) sort shuffle for the two
    # band/bucket exchanges: the stage profile (BENCH/BASELINE.md,
    # round-5 session 2) showed the plain sort's barrier bubbles leave
    # ~half the cores idle at >=8 CPUs while stage CPU stays constant;
    # push-based reads 5-8% faster end-to-end at 8/32 CPUs and is
    # neutral at 2 (measured A/B, same windows, outputs identical —
    # both shuffles are semantics-preserving physical plans).
    ray.data.DataContext.get_current().use_push_based_shuffle = True

    join_parts = auto_join_partitions(cfg.join_partitions)
    ckpt = StageCheckpointer(
        cfg.checkpoint_dir,
        fingerprint_inputs=[corpus_path],
        config_token=repr((cfg.blocking, cfg.scoring, cfg.clustering, renames)),
    )

    # no checkpoint dir -> STREAMING plan: pairs flow straight from the
    # band groupby into the scorer (no pair-stage materialization, no
    # coalescing repartitions — the read is sized to shuffle-ready
    # blocks instead, and band accounting goes to a keyed sink actor).
    # Each avoided barrier/AllToAll is fixed wall-clock that does not
    # shrink with cluster size (round-5 profile: ~12 s of exchange
    # coordination in the pair stage at EVERY cpu count).
    streaming = cfg.checkpoint_dir is None
    records = I.ingest(
        I.read_corpus(
            corpus_path,
            override_num_blocks=shuffle_partitions() if streaming else None,
        ),
        renames=renames,
    )

    def _featurize(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        # batch_size bounds the kernel's transient working set (~15 uint64
        # temporaries per content byte): small batches keep each worker's
        # arrays inside its warm malloc pool / cache instead of faulting
        # fresh pages every call — first-touch is ~100 MB/s on
        # cgroup-limited hosts, so page faults, not compute, dominate big
        # batches.  Measured at sf0.1/32cpu: 128 ≈ 64 < 256 ≈ 512 < 1024
        # (~2x stage win for 128 vs 1024, consistent across samples).
        return ds.map_batches(
            lambda b: B.featurize_batch(
                b, cfg.blocking, cfg.scoring.embed_dim, cfg.scoring.embed_kgram
            ),
            batch_format="pyarrow",
            batch_size=128,
            zero_copy_batch=True,
        )

    shard_groups = _input_shard_groups(corpus_path) if cfg.checkpoint_dir else None
    if shard_groups and len(shard_groups) > 1:
        # per-partition resume: each input-shard group is an independently
        # committed partition (record ids are content fingerprints, so a
        # partition-wise rebuild is byte-equivalent to the fused stage)
        features = ckpt.through_partitioned(
            "features",
            shard_groups,
            lambda files: _featurize(I.ingest(I.read_corpus(files), renames=renames)),
        )
    else:
        features = ckpt.through("features", lambda: _featurize(records))

    if streaming:
        from ..state.accounting import new_stats_sink

        sink = new_stats_sink()
        pairs = B.candidate_pairs(
            features, cfg.blocking, stats_sink=sink, coalesce=False
        )
    else:
        pairs_full = ckpt.through(
            "pairs", lambda: B.candidate_pairs(features, cfg.blocking, keep_stats=True)
        )
        # band accounting (no-silent-caps): the stats rows rode through
        # the pair shuffle; summing them over the materialized stage is
        # cheap, and the accounting rides the checkpoint Parquet itself
        ckpt.stats["blocking_bands"] = B.extract_band_stats(pairs_full)
        pairs = B.strip_band_stats(pairs_full)

    scored = ckpt.through(
        "scored",
        lambda: S.score_pairs_auto(
            pairs, features, cfg.scoring, cfg.blocking, join_parts, fan_out=not streaming
        ),
    )
    if streaming:
        # scored is materialized, so every emit task has run and (via the
        # in-task ray.get) recorded its bucket's counts — totals are final
        totals = ray.get(sink.totals.remote("blocking"))
        ckpt.stats["blocking_bands"] = {
            k: totals.get(k, 0)
            for k in ("dropped_bands", "salted_bands", "capped_groups")
        }

    edges = scored.map_batches(
        lambda t: t.filter(pa.compute.equal(t["accepted"], True))
        .select(["id_a", "id_b"])
        .rename_columns(["u", "v"]),
        batch_format="pyarrow",
    )
    comp = ckpt.through("components", lambda: C.connected_components(edges, cfg.clustering))

    # derive the slim id table from the MATERIALIZED features — `records`
    # is lazy, so selecting from it here would re-execute the entire
    # ingest scan (read + sha256 + remap) inside the clusters stage
    slim = features.map_batches(
        lambda t: t.select(["record_id", "repo", "path", "sha256"]), batch_format="pyarrow"
    )
    clusters = ckpt.through(
        "clusters",
        lambda: C.assign_clusters(
            slim,
            comp,
            join_parts,
            broadcast_limit_rows=cfg.clustering.assign_broadcast_limit_rows,
        ),
    )
    return LinkageResult(clusters=clusters, scored_pairs=scored, stats=ckpt.stats)


def cluster_representatives(
    clusters: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """One canonical representative per cluster: the min record_id
    (the reference's "pick canonical page per entity" — J8/A4,
    ``multilingual_dataset/creator.py:94-132``)."""
    return (
        clusters.groupby("cluster_id")
        .min("record_id")
        .map_batches(
            lambda t: t.rename_columns(["cluster_id", "representative_id"]),
            batch_format="pyarrow",
        )
    )


def cluster_sizes(clusters: "ray.data.Dataset") -> "ray.data.Dataset":
    return clusters.groupby("cluster_id").count()
