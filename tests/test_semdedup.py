"""semantic_dedup (SemDeDup, arXiv:2303.09540) vs a naive single-process
oracle implementing the same spec: seeded k-means on unit vectors
(centroids rounded to 6 dp per round), then drop any row with a
lower-vec_id same-cluster neighbor at cosine >= threshold."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _naive_semdedup(ids, mat, k, threshold, iters):
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids, kind="stable")
    cent = unit[order[:k]].copy()
    for _ in range(iters):
        assign = np.array([int(np.argmax(cent @ u)) for u in unit])
        new = cent.copy()
        for c in range(k):
            members = unit[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        new = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cent = np.round(new, 6)
    assign = np.array([int(np.argmax(cent @ u)) for u in unit])
    kept = {}
    for c in range(k):
        midx = np.where(assign == c)[0]
        midx = midx[np.argsort(ids[midx], kind="stable")]
        for i, a in enumerate(midx):
            dup = any(
                float(unit[b] @ unit[a]) >= threshold for b in midx[:i]
            )
            kept[int(ids[a])] = (c, not dup)
    return kept


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_matches_naive_oracle(tmp_path):
    rng = np.random.RandomState(42)
    n, d, k = 240, 16, 6
    # planted structure: a few tight groups plus noise, with exact dupes
    base = rng.randn(k, d)
    mat = base[rng.randint(0, k, n)] + 0.15 * rng.randn(n, d)
    mat[50] = mat[10]  # exact duplicate -> must be dropped
    mat[51] = mat[10] * 2.0  # scaled duplicate (same direction) -> dropped
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous ids
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([row.astype(np.float32) for row in mat]),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    from mel_ray.annops import semantic_dedup

    out = semantic_dedup(str(tmp_path), num_clusters=k, threshold=0.9, iters=3)
    got = {
        int(r["vec_id"]): (int(r["cluster"]), bool(r["kept"]))
        for r in out.take_all()
    }
    # float32 parquet round-trips through the pipeline; mirror it
    expect = _naive_semdedup(ids, mat.astype(np.float32).astype(np.float64), k, 0.9, 3)
    assert len(got) == n
    assert got == expect
    assert got[int(ids[50])][1] is False
    assert got[int(ids[51])][1] is False
    assert sum(1 for _, (_, kk) in got.items() if not kk) >= 2
