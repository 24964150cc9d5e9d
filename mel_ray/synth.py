"""Deterministic synthetic source-code corpus (FIXTURES.md F1-F4).

Generates the ``input_hint`` table — ``(repo, path, commit, lang,
content)`` — with planted entity clusters of near-duplicate files, the
ground-truth ``labels`` table, and the ``labeled_pairs`` evaluation
table (pairs sharing >=1 LSH blocking key, per BASELINE.json: F1 is
measured "on labeled pairs at shared blocking keys", the recast of the
reference's recall-among-retrieved-candidates framing,
``src/models/recall_calculator.py:43-66``).

Planted structure (mirrors how the reference's test corpus plants wiki
links, SURVEY.md §5):

* ~30% of files belong to clusters of 2-8 near-duplicates: exact copies,
  whitespace-only edits, line-level edits down to Jaccard ≈ 0.6, fork /
  path renames.
* a "license/boilerplate" family: ~5% of entities carry one of three
  shared 40-line license headers — the hot-key skew stressor (the
  "Paris" alias analogue, ``src/baselines/olpeat/at_embeddings.py:3-8``).
* everything is a pure function of the seed: same seed => byte-identical
  Parquet, stable sha256 multiset.

Generation is single-process NumPy; output is written atomically
(tmp dir + rename) with a ``meta.json`` marker so concurrent/repeat
callers reuse the cached corpus.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import U64
from .functions.minhash import band_keys, minhash_signature
from .functions.shingles import line_shingles

# rows per scale point (FIXTURES.md F6)
SCALE_ROWS = {
    "sf0.001": 6_000,
    "sf0.01": 60_000,
    "sf0.1": 600_000,
    "sf0.3": 1_800_000,
    # scaling-evidence points: fixed per-stage costs (exchange
    # coordination, pool spin-up) amortize with input size, so the
    # two-parallelism-level efficiency is measured on a rising scale
    # ladder (see BENCH/BASELINE.md)
    "sf0.6": 3_600_000,
    "sf1.0": 6_000_000,
}
DEFAULT_ROOT = Path(os.environ.get("MEL_RAY_CORPUS_ROOT", "/tmp/mel_ray_corpus"))

NUM_HASHES = 128
NUM_BANDS = 32

_LANGS = [("py", "py"), ("js", "js"), ("java", "java"), ("c", "c"), ("go", "go"), ("rs", "rs"), ("md", "md")]


def _build_line_pool(rng: np.random.RandomState, n_pool: int = 6000) -> list[str]:
    kws = [
        "def f{a}_{b}(x, y): return x + {c}",
        "class C{a}(Base{b}): pass",
        "import module_{a}_{b}",
        "for i{a} in range({c}): total += i{a} * {b}",
        "if cond_{a} and flag_{b}: handle_{c}()",
        "int val_{a} = {c} + offset_{b};",
        "static void proc_{a}(ctx_{b} *p) {{ p->n = {c}; }}",
        "let v{a} = arr_{b}.map(e => e * {c});",
        "func Do{a}(n int) int {{ return n * {c} }}",
        "fn calc_{a}(v: u64) -> u64 {{ v ^ {c} }}",
        "var out{a} = query_{b}.filter(r => r.id > {c});",
        "try: run_{a}({c})",
        "except Err{a}: log.warn('e{b}', {c})",
        "# note {a}: refactor helper_{b} before {c}",
        "// TODO {a}: cache result_{b} ({c})",
        "return merge_{a}(left_{b}, right_{c})",
        "while queue_{a}: item_{b} = queue_{a}.pop({c})",
        "public String render{a}(Model m{b}) {{ return t{c}; }}",
        "const CFG_{a} = {{ depth: {c}, name: 'n{b}' }};",
        "assert check_{a}(x_{b}) == {c}",
    ]
    out = []
    for i in range(n_pool):
        t = kws[i % len(kws)]
        out.append(t.format(a=int(rng.randint(10000)), b=int(rng.randint(10000)), c=int(rng.randint(100000))))
    return out


def _build_licenses() -> list[list[str]]:
    blocks = []
    for name, year, org in [("Apache License 2.0", 2004, "ASF"), ("MIT License", 1988, "MIT"), ("GPL v3", 2007, "FSF")]:
        lines = [f"# {name} - Copyright (c) {year} {org}"]
        for i in range(29):
            lines.append(
                f"# clause {i}: permission is granted to use, copy, modify and "
                f"distribute this software under condition {name.split()[0].lower()}-{i}"
            )
        blocks.append(lines)
    return blocks


def _segments_pool(rng: np.random.RandomState, n: int = 400) -> list[str]:
    stems = ["src", "lib", "core", "util", "pkg", "internal", "api", "cmd", "app", "test", "common", "server", "client", "data", "io"]
    return [f"{stems[i % len(stems)]}{int(rng.randint(1000))}" for i in range(n)]


def generate_corpus(out_dir: str | Path, n_files: int, seed: int = 42) -> Path:
    """Generate the corpus into ``out_dir`` (atomic); returns the dir."""
    out_dir = Path(out_dir)
    if (out_dir / "meta.json").exists():
        return out_dir
    rng = np.random.RandomState(seed)
    pool = _build_line_pool(rng)
    licenses = _build_licenses()
    segs = _segments_pool(rng)
    n_pool = len(pool)

    # ---- entity sizes ----------------------------------------------------
    sizes: list[int] = []
    total = 0
    while total < n_files:
        if rng.rand() < 0.70:
            s = 1
        else:
            s = int(rng.randint(2, 9))
        s = min(s, n_files - total)
        sizes.append(s)
        total += s
    n_entities = len(sizes)

    repos: list[str] = []
    paths: list[str] = []
    commits: list[str] = []
    langs: list[str] = []
    contents: list[str] = []
    entity_ids: list[int] = []

    hexd = np.array(list("0123456789abcdef"))

    for eid, size in enumerate(sizes):
        lic = int(rng.randint(len(licenses))) if rng.rand() < 0.05 else -1
        # licensed entities carry >=30 own lines so cross-entity Jaccard via
        # the shared 30-line license header stays <= 30/90 = 0.33 — below the
        # scorer's accept threshold, while within-entity pairs stay >= ~0.65.
        L = int(rng.randint(30, 61)) if lic >= 0 else int(rng.randint(10, 61))
        base_lines = rng.randint(0, n_pool, L)
        ext, lang = _LANGS[int(rng.randint(len(_LANGS)))]
        org = f"org{int(rng.randint(2000))}"
        proj = f"proj{eid}"
        depth = int(rng.randint(1, 5))
        base_segs = [segs[int(rng.randint(len(segs)))] for _ in range(depth)]
        fname = f"file{int(rng.randint(100000))}.{ext}"

        for m in range(size):
            if m == 0:
                lines_idx = base_lines
                mode = "base"
            else:
                mode = ["copy", "ws", "edit", "edit", "edit"][int(rng.randint(5))]
                if mode in ("copy", "ws"):
                    lines_idx = base_lines
                else:
                    # bounded edits keep within-entity Jaccard >= ~0.65
                    lines_idx = base_lines.copy()
                    frac = rng.uniform(0.03, 0.15)
                    n_mut = max(1, int(frac * L))
                    pos = rng.choice(L, size=min(n_mut, L), replace=False)
                    lines_idx[pos] = rng.randint(0, n_pool, len(pos))
                    if L > 12 and rng.rand() < 0.5:
                        keep = np.ones(L, dtype=bool)
                        keep[int(rng.randint(L))] = False
                        lines_idx = lines_idx[keep]
                    if rng.rand() < 0.5:
                        lines_idx = np.concatenate([lines_idx, rng.randint(0, n_pool, 1)])

            body = [pool[i] for i in lines_idx]
            if lic >= 0:
                body = licenses[lic] + body
            if mode == "ws":
                indents = rng.randint(0, 4, len(body))
                text = "\n".join(" " * int(ind) + ln for ind, ln in zip(indents, body))
            else:
                text = "\n".join(body)

            r_org = org
            if m > 0 and rng.rand() < 0.3:
                r_org = f"org{int(rng.randint(2000))}"  # fork
            p_segs = list(base_segs)
            if m > 0 and p_segs and rng.rand() < 0.3:
                p_segs[int(rng.randint(len(p_segs)))] = segs[int(rng.randint(len(segs)))]
            commit = "".join(hexd[rng.randint(0, 16, 40)])

            repos.append(f"{r_org}/{proj}")
            paths.append("/".join(p_segs + [fname]))
            commits.append(commit)
            langs.append(lang)
            contents.append(text)
            entity_ids.append(eid)

    assert len(contents) == n_files

    files_tbl = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # chunked: one flat string array overflows int32 offsets
            # beyond ~2 GB of content (hit at the 1.8M-row scale point)
            "content": pa.chunked_array(
                [
                    pa.array(contents[i : i + 100_000], pa.string())
                    for i in range(0, max(len(contents), 1), 100_000)
                ]
            ),
        }
    )
    # record ids = the engine's own deterministic (repo, path, commit)
    # fingerprint, so labels survive any distributed re-ordering.
    from .stages.ingest import record_fingerprint

    rid = record_fingerprint(files_tbl["repo"], files_tbl["path"], files_tbl["commit"])
    assert len(np.unique(rid)) == n_files, "fingerprint collision in synthetic corpus"
    labels_tbl = pa.table(
        {
            "record_id": pa.array(rid),
            "entity_id": pa.array(np.asarray(entity_ids, dtype=np.int64)),
        }
    )

    # ---- labeled pairs at shared blocking keys (FIXTURES.md F3) ----------
    ent = np.asarray(entity_ids, dtype=np.int64)
    pair_a, pair_b, pair_key = _band_sharing_pairs(files_tbl["content"], rng)
    is_match = ent[pair_a] == ent[pair_b]
    fa, fb = rid[pair_a], rid[pair_b]
    pair_a, pair_b = np.minimum(fa, fb), np.maximum(fa, fb)
    # keep all positives; cap negatives at 3x positives (deterministic)
    pos = np.flatnonzero(is_match)
    neg = np.flatnonzero(~is_match)
    if len(neg) > 3 * max(len(pos), 1):
        sel = rng.choice(len(neg), size=3 * max(len(pos), 1), replace=False)
        neg = np.sort(neg[sel])
    keep = np.sort(np.concatenate([pos, neg]))
    pairs_tbl = pa.table(
        {
            "id_a": pa.array(pair_a[keep]),
            "id_b": pa.array(pair_b[keep]),
            "is_match": pa.array(is_match[keep]),
            "block_key": pa.array([f"{k:016x}" for k in pair_key[keep]], pa.string()),
        }
    )

    # rename map over *actual* repos (the QID-redirect analogue must hit)
    uniq_repos = sorted(set(repos))
    n_ren = min(20, len(uniq_repos))
    ren_idx = np.sort(rng.choice(len(uniq_repos), size=n_ren, replace=False))
    renames_tbl = pa.table(
        {
            "old_repo": pa.array([uniq_repos[i] for i in ren_idx], pa.string()),
            "new_repo": pa.array([uniq_repos[i] + "-renamed" for i in ren_idx], pa.string()),
        }
    )

    tmp = out_dir.parent / (out_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    # The corpus is SHARDED into part files (like any real corpus): one
    # read task per file in Ray, so read+featurize parallelism is not
    # throttled by single-file granularity; small row groups besides.
    (tmp / "files").mkdir()
    n_shards = max(4, min(64, n_files // 8192 + 1))
    shard = (n_files + n_shards - 1) // n_shards
    for s in range(n_shards):
        sl = files_tbl.slice(s * shard, shard)
        if len(sl):
            pq.write_table(sl, tmp / "files" / f"part-{s:05d}.parquet", row_group_size=8192)
    pq.write_table(labels_tbl, tmp / "labels.parquet")
    pq.write_table(pairs_tbl, tmp / "labeled_pairs.parquet")
    pq.write_table(renames_tbl, tmp / "repo_renames.parquet")
    (tmp / "meta.json").write_text(
        json.dumps(
            {
                "n_files": n_files,
                "n_entities": n_entities,
                "seed": seed,
                "num_hashes": NUM_HASHES,
                "num_bands": NUM_BANDS,
                "n_labeled_pairs": int(len(keep)),
                "n_positive_pairs": int(len(pos)),
            }
        )
    )
    out_dir.parent.mkdir(parents=True, exist_ok=True)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # another process won the race; keep theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _band_sharing_pairs(
    content: pa.ChunkedArray, rng: np.random.RandomState, max_pairs_per_band: int = 300
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (capped) record pairs sharing an LSH band key, via the engine's
    own blocking kernels — single-process reference implementation."""
    # keep the ChunkedArray: combining >2 GB of content overflows the
    # int32 string offsets; every consumer below works on 20k-row slices
    arr = content
    n = len(arr)
    all_bh = []
    all_rid = []
    chunk = 20_000
    for c0 in range(0, n, chunk):
        sl = arr.slice(c0, chunk)
        v, off = line_shingles(sl)
        sig = minhash_signature(v, off, NUM_HASHES)
        _, bh = band_keys(sig, NUM_BANDS)
        all_bh.append(bh)
        all_rid.append(np.repeat(np.arange(c0, c0 + len(sl), dtype=np.int64), NUM_BANDS))
    bh = np.concatenate(all_bh)
    rid = np.concatenate(all_rid)
    order = np.lexsort((rid, bh))
    bh, rid = bh[order], rid[order]
    # run boundaries over equal band hashes
    bounds = np.flatnonzero(np.diff(bh) != 0) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(bh)]])
    lens = ends - starts
    pa_, pb_, pk_ = [], [], []
    # vectorized fast path: runs of exactly 2 (the vast majority)
    two = np.flatnonzero(lens == 2)
    if len(two):
        s2 = starts[two]
        a2, b2 = rid[s2], rid[s2 + 1]
        ok = a2 != b2
        lo, hi = np.minimum(a2, b2)[ok], np.maximum(a2, b2)[ok]
        pa_.append(lo)
        pb_.append(hi)
        pk_.append(bh[s2][ok])
    for idx in np.flatnonzero(lens > 2):
        s, e = starts[idx], ends[idx]
        members = np.unique(rid[s:e])
        if len(members) < 2:
            continue
        iu, ju = np.triu_indices(len(members), k=1)
        if len(iu) > max_pairs_per_band:
            sel = rng.choice(len(iu), size=max_pairs_per_band, replace=False)
            iu, ju = iu[sel], ju[sel]
        pa_.append(members[iu])
        pb_.append(members[ju])
        pk_.append(np.full(len(iu), bh[s], dtype=U64))
    if not pa_:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=U64)
    a = np.concatenate(pa_)
    b = np.concatenate(pb_)
    k = np.concatenate(pk_)
    # canonical order + dedup on (a, b), keeping first (lowest band hash kept arbitrarily)
    key = a.astype(np.int64) * (2**32) + b.astype(np.int64)
    order = np.argsort(key, kind="stable")
    a, b, k, key = a[order], b[order], k[order], key[order]
    first = np.concatenate([[True], np.diff(key) != 0])
    return a[first], b[first], k[first]


def corpus_path_for(sf_dir: str | Path) -> Path:
    name = Path(sf_dir).name or "sf0.001"
    return DEFAULT_ROOT / name


def ensure_corpus(sf_dir: str | Path) -> Path:
    """Generate (once, cached) the corpus matching a testdata scale dir."""
    name = Path(sf_dir).name
    n = SCALE_ROWS.get(name, 6_000)
    return generate_corpus(corpus_path_for(sf_dir), n)
