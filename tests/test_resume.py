"""Checkpoint/resume: the idempotence contract (SURVEY.md §3.3).

Kill-and-rerun semantics: a completed stage is restored from its
manifest (not recomputed); manifests are byte-identical across reruns;
a stale fingerprint forces recompute."""

from __future__ import annotations

import json

import pytest


@pytest.mark.usefixtures("ray_session")
def test_stage_checkpoint_restore_and_manifest(tmp_path, tiny_corpus):
    from mel_ray.config import LinkageConfig
    from mel_ray.pipelines.linkage import run_linkage

    ckpt = tmp_path / "ckpt"
    cfg = LinkageConfig(checkpoint_dir=str(ckpt))
    res1 = run_linkage(str(tiny_corpus / "files"), cfg)
    n1 = res1.clusters.count()
    assert not res1.stats["features"]["restored"]
    manifests1 = {
        p.parent.name: p.read_bytes() for p in ckpt.glob("*/manifest.json")
    }
    assert set(manifests1) == {"features", "pairs", "scored", "components", "clusters"}
    for name, raw in manifests1.items():
        m = json.loads(raw)
        assert m["row_count"] == sum(part["rows"] for part in m["partitions"])
        assert all(part["done"] for part in m["partitions"])

    # second run: every stage restored, manifests untouched (byte-identical)
    res2 = run_linkage(str(tiny_corpus / "files"), cfg)
    assert res2.clusters.count() == n1
    for name in manifests1:
        assert res2.stats[name]["restored"], name
    manifests2 = {p.parent.name: p.read_bytes() for p in ckpt.glob("*/manifest.json")}
    assert manifests1 == manifests2


@pytest.mark.usefixtures("ray_session")
def test_torn_stage_is_recomputed(tmp_path, tiny_corpus):
    from mel_ray.config import LinkageConfig
    from mel_ray.pipelines.linkage import run_linkage

    ckpt = tmp_path / "ckpt"
    cfg = LinkageConfig(checkpoint_dir=str(ckpt))
    run_linkage(str(tiny_corpus / "files"), cfg)
    # simulate a crash mid-stage: manifest missing, partial temp data present
    import shutil

    stage = ckpt / "scored"
    (stage / "manifest.json").unlink()
    shutil.move(str(stage / "data"), str(stage / ".tmp-data"))
    res = run_linkage(str(tiny_corpus / "files"), cfg)
    assert not res.stats["scored"]["restored"]       # recomputed
    assert res.stats["features"]["restored"]         # earlier stages untouched
    assert (stage / "manifest.json").exists()
