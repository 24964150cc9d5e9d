"""End-to-end flagship pipeline tests: the F1 >= 0.99 gate
(BASELINE.json metric) plus conservation invariants (SURVEY.md §5)."""

from __future__ import annotations

import collections

import numpy as np

import pyarrow.parquet as pq
import pytest

from mel_ray.config import LinkageConfig


@pytest.mark.usefixtures("ray_session")
class TestLinkagePipeline:
    @pytest.fixture(scope="class")
    def result(self, tiny_corpus):
        from mel_ray.pipelines.linkage import run_linkage

        res = run_linkage(str(tiny_corpus / "files"))
        return tiny_corpus, res

    def test_f1_gate(self, result):
        import ray.data

        from mel_ray.stages.evaluate import linkage_f1

        corpus, res = result
        lp = ray.data.read_parquet(str(corpus / "labeled_pairs.parquet"))
        metrics = linkage_f1(lp, res.clusters)
        assert metrics["f1"].iloc[0] >= 0.99, metrics.to_string()

    def test_clusters_partition_all_records(self, result):
        corpus, res = result
        rows = res.clusters.take_all()
        n_input = pq.read_table(corpus / "files", columns=["lang"]).num_rows
        assert len(rows) == n_input
        # cluster_id = min(record_id) of the component -> cluster_id <= record_id
        for r in rows:
            assert r["cluster_id"] <= r["record_id"]

    def test_sha256_multiset_preserved(self, result):
        import hashlib

        corpus, res = result
        files = pq.read_table(corpus / "files")
        want = collections.Counter(
            hashlib.sha256(c.as_py().encode()).hexdigest() for c in files["content"]
        )
        got = collections.Counter(r["sha256"] for r in res.clusters.take_all())
        assert got == want

    def test_exact_duplicates_share_cluster(self, result):
        corpus, res = result
        rows = res.clusters.take_all()
        by_sha = collections.defaultdict(set)
        for r in rows:
            by_sha[r["sha256"]].add(r["cluster_id"])
        for sha, cids in by_sha.items():
            assert len(cids) == 1, f"identical content split across clusters: {sha}"

    def test_candidate_pairs_sound(self, result, tiny_corpus):
        """Every accepted pair has high true Jaccard (no hallucinated pairs)."""
        import numpy as np

        from mel_ray.functions.minhash import exact_jaccard
        from mel_ray.functions.shingles import line_shingles

        corpus, res = result
        files = pq.read_table(corpus / "files")
        labels = pq.read_table(corpus / "labels.parquet").to_pandas()
        row_of = {rid: i for i, rid in enumerate(labels.record_id)}
        v, off = line_shingles(files["content"].combine_chunks())
        accepted = [r for r in res.scored_pairs.take_all() if r["accepted"]]
        assert len(accepted) > 100
        for r in accepted[:500]:
            j = exact_jaccard(v, off, row_of[r["id_a"]], row_of[r["id_b"]])
            assert j > 0.35, (r, j)


@pytest.mark.usefixtures("ray_session")
def test_blocking_quality_matches_naive():
    import pyarrow.parquet as pq

    from mel_ray.corpusops import blocking_quality, linkage_scored_pairs
    from mel_ray.synth import ensure_corpus

    sf = "/root/testdata/sf0.001"
    got = blocking_quality(sf).iloc[0]
    corpus = ensure_corpus(sf)
    lp = pq.read_table(str(corpus / "labeled_pairs.parquet")).to_pandas()
    pos = lp[lp.is_match]
    pos_keys = set(zip(np.minimum(pos.id_a, pos.id_b), np.maximum(pos.id_a, pos.id_b)))
    cand = linkage_scored_pairs(sf).to_pandas()
    cand_keys = set(zip(cand.id_a, cand.id_b))
    n = got["n_records"]
    assert got["n_candidates"] == len(cand_keys)
    assert got["n_labeled_matches"] == len(pos_keys)
    assert got["matches_covered"] == len(pos_keys & cand_keys)
    assert got["reduction_ratio"] == round(1 - len(cand_keys) / (n * (n - 1) / 2), 6)
    assert got["pair_completeness"] == round(len(pos_keys & cand_keys) / len(pos_keys), 6)
    # the flagship's blocking must be both sharp and complete
    assert got["reduction_ratio"] > 0.99
    assert got["pair_completeness"] >= 0.99


@pytest.mark.usefixtures("ray_session")
def test_fs_weights_matches_naive():
    import pyarrow.parquet as pq

    from mel_ray.corpusops import fs_weights, linkage_scored_pairs
    from mel_ray.synth import ensure_corpus

    sf = "/root/testdata/sf0.001"
    got = fs_weights(sf).set_index("feature")
    corpus = ensure_corpus(sf)
    lp = pq.read_table(str(corpus / "labeled_pairs.parquet")).to_pandas()
    lp["id_a"], lp["id_b"] = (
        np.minimum(lp.id_a, lp.id_b),
        np.maximum(lp.id_a, lp.id_b),
    )
    cand = linkage_scored_pairs(sf).to_pandas()
    j = lp.merge(cand, on=["id_a", "id_b"], how="inner")
    n_m = max(int(j.is_match.sum()), 1)
    n_u = max(int((~j.is_match).sum()), 1)
    for name, thr in (("est_jaccard", 0.7), ("cosine", 0.5), ("path_jw", 0.9)):
        agree = j[name] >= thr
        m = round(int((agree & j.is_match).sum()) / n_m, 6)
        u = round(int((agree & ~j.is_match).sum()) / n_u, 6)
        assert got.loc[name, "m"] == pytest.approx(m, abs=2e-6)
        assert got.loc[name, "u"] == pytest.approx(u, abs=2e-6)
    # a discriminative feature separates matches from non-matches
    assert got.loc["est_jaccard", "m"] > got.loc["est_jaccard", "u"]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_scoring_path_matches_broadcast(tiny_corpus):
    """The declared 100-TB path (verify -> attach -> PairScorer cascade,
    partitioned Dataset.joins; plus the partitioned left-outer cluster
    assign) must produce EXACTLY the broadcast fast path's results — the
    oracle-vs-optimized discipline of the reference's
    SimplifiedBruteForceSearcher (models/searchers/
    simplified_brute_force_searcher.py:1-20).  broadcast_limit_rows=0
    forces every selector to the partitioned branch."""
    from dataclasses import replace

    from mel_ray.config import ClusteringConfig, LinkageConfig, ScoringConfig
    from mel_ray.pipelines.linkage import run_linkage

    def collect(cfg):
        res = run_linkage(str(tiny_corpus / "files"), cfg)
        pairs = (
            res.scored_pairs.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        clusters = {
            r["record_id"]: r["cluster_id"] for r in res.clusters.take_all()
        }
        return pairs, clusters

    base = LinkageConfig()
    forced = LinkageConfig(
        scoring=replace(base.scoring, broadcast_limit_rows=0),
        clustering=replace(base.clustering, assign_broadcast_limit_rows=0),
    )
    b_pairs, b_clusters = collect(base)
    p_pairs, p_clusters = collect(forced)
    assert len(b_pairs) > 100
    assert list(b_pairs.columns) == list(p_pairs.columns)
    assert len(b_pairs) == len(p_pairs)
    for col in b_pairs.columns:
        bv, pv = b_pairs[col].to_numpy(), p_pairs[col].to_numpy()
        assert (bv == pv).all(), f"column {col} diverges between scoring paths"
    assert b_clusters == p_clusters


@pytest.mark.usefixtures("ray_session")
def test_incremental_linkage_equals_full_run(tiny_corpus):
    """Daily-ingest contract: linking a delta batch against a base
    result (run_linkage_incremental) produces a cluster table IDENTICAL
    to a from-scratch run over base ∪ delta — same pair decisions (the
    band/salt/cap semantics see the same run lengths) and same labels
    (base connectivity enters as label edges; min-id labeling is
    closure-invariant)."""
    from pathlib import Path

    from mel_ray.pipelines.linkage import run_linkage, run_linkage_incremental

    files = sorted(str(f) for f in (Path(tiny_corpus) / "files").rglob("*.parquet"))
    assert len(files) >= 2, "need at least two shards to split base/delta"
    base_files, delta_files = files[:-1], files[-1:]

    full = run_linkage(str(tiny_corpus / "files"))
    base = run_linkage(base_files)
    inc = run_linkage_incremental(base, delta_files)

    want = (
        full.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    got = (
        inc.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.record_id.to_numpy() == want.record_id.to_numpy()).all()
    assert (got.cluster_id.to_numpy() == want.cluster_id.to_numpy()).all()

    # the incremental scored set touches the delta only: every scored
    # pair has at least one member absent from the base feature table
    base_ids = set(
        base.features.to_pandas()["record_id"].to_numpy().tolist()
    )
    sp = inc.scored_pairs.to_pandas()
    assert len(sp) > 0
    touches_delta = (~sp.id_a.isin(base_ids)) | (~sp.id_b.isin(base_ids))
    assert touches_delta.all()


@pytest.mark.usefixtures("ray_session")
def test_incremental_from_checkpoint_equals_full_run(tiny_corpus, tmp_path):
    """Restart story: the base result is rehydrated from a CHECKPOINTED
    run's stage parquet (load_result_from_checkpoint) and the delta is
    merged incrementally — output identical to a from-scratch run over
    base ∪ delta (the run_linkage_job --delta path)."""
    from pathlib import Path

    from mel_ray.config import LinkageConfig
    from mel_ray.pipelines.linkage import (
        load_result_from_checkpoint,
        run_linkage,
        run_linkage_incremental,
    )

    files = sorted(str(f) for f in (Path(tiny_corpus) / "files").rglob("*.parquet"))
    base_files, delta_files = files[:-1], files[-1:]

    # checkpointed base run, then restore purely from disk
    run_linkage(base_files, LinkageConfig(checkpoint_dir=str(tmp_path / "ck")))
    base = load_result_from_checkpoint(str(tmp_path / "ck"))
    assert base.features is not None and base.clusters is not None

    inc = run_linkage_incremental(base, delta_files)
    full = run_linkage(str(tiny_corpus / "files"))

    want = (
        full.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    got = (
        inc.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.record_id.to_numpy() == want.record_id.to_numpy()).all()
    assert (got.cluster_id.to_numpy() == want.cluster_id.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_incremental_chain_two_deltas_equals_full_run(tiny_corpus, tmp_path):
    """Daily-ingest chaining: base ⊕ delta₁ is committed back to disk
    (save_result_checkpoint), delta₂ links against the restored merge —
    the final clusters equal a from-scratch run over ALL shards (the
    merge is associative because each step preserves the exact-equality
    contract)."""
    from pathlib import Path

    from mel_ray.pipelines.linkage import (
        load_result_from_checkpoint,
        run_linkage,
        run_linkage_incremental,
        save_result_checkpoint,
    )

    files = sorted(str(f) for f in (Path(tiny_corpus) / "files").rglob("*.parquet"))
    assert len(files) >= 3, "need three shards for a two-delta chain"
    base_files, d1, d2 = files[:-2], files[-2:-1], files[-1:]

    base = run_linkage(base_files)
    step1 = run_linkage_incremental(base, d1)
    written = save_result_checkpoint(step1, str(tmp_path / "merged"))
    assert written["features"] == written["clusters"] > 0
    restored = load_result_from_checkpoint(str(tmp_path / "merged"))
    step2 = run_linkage_incremental(restored, d2)

    full = run_linkage(str(tiny_corpus / "files"))
    want = (
        full.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    got = (
        step2.clusters.to_pandas()[["record_id", "cluster_id"]]
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.record_id.to_numpy() == want.record_id.to_numpy()).all()
    assert (got.cluster_id.to_numpy() == want.cluster_id.to_numpy()).all()
