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


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_salts_planted_mega_cluster(tmp_path):
    """VERDICT r4: a cluster past salt_limit must be split into
    deterministic splitmix64 sub-groups (memory/compute cap like the
    LSH mega-bands) — every row still appears exactly once, each
    sub-group keeps exactly its lowest vec_id when all rows are
    near-identical, and the un-salted run keeps exactly one."""
    rng = np.random.RandomState(7)
    n, d = 300, 16
    direction = rng.randn(d)
    # one tight mega-cluster: all rows near-identical in direction
    mat = direction[None, :] * rng.uniform(0.5, 2.0, size=(n, 1))
    mat += 1e-4 * rng.randn(n, d)
    ids = np.arange(n, dtype=np.int64) * 7 + 3
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([row.astype(np.float32) for row in mat]),
                "label": pa.array(np.zeros(n, dtype=np.int32)),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    from mel_ray.annops import semantic_dedup
    from mel_ray.functions.hashing import splitmix64

    # un-salted baseline: single cluster, one survivor (the lowest id)
    base = semantic_dedup(
        str(tmp_path), num_clusters=1, threshold=0.99, iters=1
    ).to_pandas()
    assert len(base) == n
    assert base[base.kept].vec_id.tolist() == [int(ids.min())]

    # salted: salt_limit=50 -> ceil(300/50)=6 sub-groups
    salt_limit = 50
    out = semantic_dedup(
        str(tmp_path), num_clusters=1, threshold=0.99, iters=1,
        salt_limit=salt_limit,
    ).to_pandas()
    assert len(out) == n and out.vec_id.is_unique
    n_sub = int(np.ceil(n / salt_limit))
    sub = (splitmix64(ids.view(np.uint64)) % np.uint64(n_sub)).astype(int)
    kept_ids = set(out[out.kept].vec_id)
    # each sub-group keeps exactly its lowest vec_id (all rows are dups)
    expect = {int(ids[sub == s].min()) for s in range(n_sub)}
    assert kept_ids == expect

    # tiled sweep is exact: a tiny tile must not change the un-salted answer
    tiled = semantic_dedup(
        str(tmp_path), num_clusters=1, threshold=0.99, iters=1, sweep_tile=17
    ).to_pandas()
    assert tiled[tiled.kept].vec_id.tolist() == [int(ids.min())]
