"""Exact-blocking linkage (mel_ray/exactlink.py): internal consistency
of the pair scoring and the cluster assembly.  Cross-engine value
equality is covered by the DuckDB oracles (tools/check_correctness.py
`linkage_exact_pairs` / `linkage_exact_clusters`)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_exact_clusters_match_naive_union_find():
    from mel_ray import exactlink

    res = exactlink._run(SF)
    scored = res.scored.to_pandas()
    assert len(scored) > 100
    assert (scored.jaccard >= 0).all() and (scored.jaccard <= 1).all()
    acc = scored[scored.accepted]
    assert len(acc) > 50
    # accepted == (jaccard >= threshold) up to the 4-dp output rounding
    assert (scored.accepted == (scored.jaccard >= exactlink.THRESHOLD)).mean() > 0.999

    clusters = {
        r["uid"]: r["cluster_id"]
        for r in exactlink.linkage_exact_clusters(SF).take_all()
    }
    records = res.records.to_pandas()
    assert len(clusters) == len(records)

    # naive union-find over accepted pairs, labels = min uid per component
    parent: dict[str, str] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(acc.uid_a, acc.uid_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {}
    comp: dict[str, list[str]] = {}
    for u in records.uid:
        comp.setdefault(find(u), []).append(u)
    for members in comp.values():
        lab = min(members)
        for u in members:
            want[u] = lab
    assert clusters == want
