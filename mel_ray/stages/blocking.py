"""Blocking stage: MinHash-LSH band keys -> candidate pairs.

Candidate-generation recast of the reference's alias table / OLPEAT
(``src/baselines/string_alias_tables/all_languages.py:93-115``,
``src/baselines/olpeat/find_recall.py:76-91``): where the reference
groups by exact mention-string / token-array keys, we group by LSH band
keys so *near*-duplicate content collides (SURVEY.md §2.7 D6 — the
architectural pivot).

Dataflow::

    records --map_batches--> features (record_id, sig, emb, path, repo)
    features --map_batches--> bands (record_id, band_id, band_hash, bucket)
    bands --groupby(bucket).map_groups--> candidate pairs (id_a < id_b)
    pairs --groupby(pair bucket).map_groups--> unique pairs

The only wide ops are two bucketed ``groupby`` shuffles over a fixed,
small number of buckets; inside each bucket everything is NumPy run-
detection over sorted arrays — no per-band Python, no per-row Python.

Skew handling (north rule: "salted band keys to defuse skew"):

* band runs larger than ``salt_limit`` are split into
  ``ceil(size/salt_limit)`` deterministic sub-groups by a salt hash of
  ``record_id`` — pair generation is quadratic per band, so hot bands
  (license/boilerplate content) must be bounded;
* runs larger than ``stopband_limit`` are dropped entirely, the
  stop-"word" cap analogue of the reference's per-token-array top-R cap
  (README.md:117-119).  Every drop is counted in the emitted
  ``__stats`` rows so lineage manifests can account for them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import BlockingConfig
from ..functions.embed import embed_strings
from ..functions.hashing import U64, splitmix64
from ..functions.minhash import band_keys, minhash_signature
from ..functions.shingles import line_shingles


def featurize_batch(batch: pa.Table, cfg: BlockingConfig, embed_dim: int, embed_k: int) -> pa.Table:
    """records -> per-record blocking/scoring features (one row per row)."""
    content = batch["content"]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    if cfg.content_window is not None:
        # M8/M9: bound per-record shingle/embed work by construction
        content = pa.compute.utf8_slice_codeunits(content, 0, cfg.content_window)
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
    values, offsets = line_shingles(content)
    sig = minhash_signature(values, offsets, cfg.num_hashes)
    emb = embed_strings(content, dim=embed_dim, k=embed_k)
    # sig/emb travel as fixed-width binary blobs: joinable by Acero
    # (list payloads are not), decoded zero-copy with np.frombuffer.
    # Compact encodings keep the pair-join shuffle small: minhash slots
    # truncated to uint32 (slot-equality comparisons are unaffected at
    # 2^-32 collision rate), embeddings as float16 (cosine is computed
    # in float32 after upcast — the reference stores fp16 embeddings
    # too, src/utils/embeddings.py:108-111).
    sig32 = (sig & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return pa.table(
        {
            "record_id": batch["record_id"],
            "repo": batch["repo"],
            "path": batch["path"],
            # sha256 rides the features table (64B/row next to 1KB of
            # sig+emb) so the cluster-assign stage reads it from the
            # MATERIALIZED features instead of re-executing the whole
            # ingest scan; every downstream join projects it away.
            "sha256": batch["sha256"],
            "sig": _binary_rows(np.ascontiguousarray(sig32)),
            "emb": _binary_rows(np.ascontiguousarray(emb.astype(np.float16))),
        }
    )


def _binary_rows(mat: np.ndarray) -> pa.Array:
    """(N, W)-matrix -> binary array of N rows of W*itemsize bytes, zero-copy."""
    n, _ = mat.shape
    row_bytes = mat.dtype.itemsize * mat.shape[1]
    data = pa.py_buffer(mat.tobytes())
    offsets = pa.py_buffer(np.arange(0, (n + 1) * row_bytes, row_bytes, dtype=np.int32).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])


def binary_matrix(col: pa.Array | pa.ChunkedArray, dtype) -> np.ndarray:
    """Inverse of :func:`_binary_rows`: binary column -> (N, W) ndarray view.

    Single-chunk ChunkedArrays take ``chunk(0)`` — pyarrow 16's
    ``combine_chunks()`` COPIES even when there is only one chunk
    (measured 0.2 s / 256 MB solo, and the copy's first-touch page
    faults collapse ~20x under concurrent workers building broadcast
    views on this cgroup-limited host: 0.65 s -> 8-19 s per worker).
    The fast path keeps the returned ndarray a true zero-copy view
    over the (plasma-shared) Arrow buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(buffers[2], dtype=dtype)
    itemsize = np.dtype(dtype).itemsize
    width = (offsets[1] - offsets[0]) // itemsize if len(col) else 0
    start = offsets[0] // itemsize
    return data[start : start + len(col) * width].reshape(len(col), width)


def expand_bands_batch(
    batch: pa.Table, cfg: BlockingConfig, num_buckets: int | None = None
) -> pa.Table:
    """features -> b band rows per record (the flat_map row expansion,
    analogue of DaMuELLinkProcessor's entity->links expansion,
    reference ``loaders/damuel.py:74-116``).

    Shingle-less records (all-sentinel signatures) are dropped before
    banding: their signatures are identical across rows, so they would
    otherwise collide in every band and verify at est_jaccard=1.0
    despite true Jaccard 0.

    ``num_buckets`` (default ``cfg.num_buckets``) is the exchange key
    granularity; callers pass the actual shuffle partition count so the
    downstream ``map_groups`` makes ONE call per partition instead of
    one per fine bucket (512 per-group calls each paying slice + table
    construction + an accounting round trip measured as the emit
    phase's dominant cost at 8 CPUs) — the emit kernel batches all band
    runs in a group, so bucket granularity is purely a balance knob,
    and per-run size is already bounded by ``stopband_limit``."""
    from ..functions.minhash import empty_signature_mask

    sig32 = binary_matrix(batch["sig"], np.uint32)
    nonempty = ~empty_signature_mask(sig32)
    if not nonempty.all():
        sig32 = sig32[nonempty]
        batch = batch.filter(pa.array(nonempty))
    band_id, band_hash = band_keys(sig32.astype(np.uint64), cfg.num_bands)
    rid = np.repeat(batch["record_id"].to_numpy(), cfg.num_bands)
    bucket = (band_hash % U64(num_buckets or cfg.num_buckets)).astype(np.int32)
    return pa.table(
        {
            "record_id": pa.array(rid),
            "band_hash": pa.array(band_hash.view(np.int64)),
            "bucket": pa.array(bucket),
        }
    )


def _emit_pairs_for_bucket(group: pa.Table, cfg: BlockingConfig, sink=None) -> pa.Table:
    """Vectorized pair emission for all band runs inside one bucket.

    Arrow-native in AND out: returning a pandas frame would re-attach
    pandas schema metadata to the block, which makes the schema
    unhashable and defeats Ray's schema dedup in every downstream
    reduce (the "Failed to hash the schemas" log spam)."""
    bh = group["band_hash"].to_numpy()
    rid = group["record_id"].to_numpy()
    order = np.lexsort((rid, bh))
    bh, rid = bh[order], rid[order]
    # dedup (band, record) duplicates, then find run boundaries per band hash
    keep = np.ones(len(bh), dtype=bool)
    keep[1:] = (np.diff(bh) != 0) | (np.diff(rid) != 0)
    bh, rid = bh[keep], rid[keep]
    change = np.flatnonzero(np.diff(bh) != 0) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(bh)]])
    lens = ends - starts

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    n_dropped_bands = 0
    n_salted_bands = 0
    n_capped_groups = 0

    # stopbands: drop mega-runs entirely
    live = lens >= 2
    drop = lens > cfg.stopband_limit
    n_dropped_bands = int(drop.sum())
    live &= ~drop

    # salted runs: deterministically split members into sub-groups
    salted = live & (lens > cfg.salt_limit)
    n_salted_bands = int(salted.sum())
    for idx in np.flatnonzero(salted):
        s, e = starts[idx], ends[idx]
        members = rid[s:e]
        k = int(np.ceil((e - s) / cfg.salt_limit))
        sub = (splitmix64(members.view(U64)) % U64(k)).astype(np.int64)
        for g in range(k):
            mem = np.sort(members[sub == g])
            if len(mem) >= 2:
                iu, ju = np.triu_indices(len(mem), k=1)
                out_a.append(mem[iu])
                out_b.append(mem[ju])

    # normal runs, grouped by run length for fully vectorized emission
    normal = live & ~salted
    for L in np.unique(lens[normal]):
        idxs = np.flatnonzero(normal & (lens == L))
        per_run = int(L) * (int(L) - 1) // 2
        if per_run > cfg.max_pairs_per_group:
            # hard per-RUN cap: emit star pairs to the min member only.
            # This is a SEMANTIC change (a different pair set), so it is
            # counted in the stats like drops/salting — no silent caps.
            # The cap is a property of the RUN alone, never of how many
            # runs share a shuffle partition: the pair set must be
            # invariant to exchange-key granularity.
            n_capped_groups += len(idxs)
            mem = rid[starts[idxs][:, None] + np.arange(L)[None, :]]
            mem = np.sort(mem, axis=1)
            out_a.append(np.repeat(mem[:, 0], L - 1))
            out_b.append(mem[:, 1:].reshape(-1))
            continue
        # memory guard (NOT semantic): emit the length class in chunks so
        # one gather never materializes more than ~max_pairs_per_group
        # pairs at once
        iu, ju = np.triu_indices(L, k=1)
        chunk = max(1, cfg.max_pairs_per_group // max(per_run, 1))
        for s in range(0, len(idxs), chunk):
            part = idxs[s : s + chunk]
            # gather members matrix (num_runs, L), sort rows for canonical pairs
            mem = rid[starts[part][:, None] + np.arange(L)[None, :]]
            mem = np.sort(mem, axis=1)
            out_a.append(mem[:, iu].reshape(-1))
            out_b.append(mem[:, ju].reshape(-1))

    if out_a:
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
    else:
        a = np.empty(0, dtype=np.int64)
        b = np.empty(0, dtype=np.int64)
    bucket_id = int(group["bucket"][0].as_py()) if len(group) else 0
    if sink is not None:
        # streaming accounting: record per-bucket counts in the keyed
        # sink actor instead of emitting sentinel rows.  The ray.get
        # makes "this emit task finished" imply "its counts are
        # recorded", so totals read after the consuming stage
        # materializes are race-free; keyed overwrite makes task
        # retries idempotent (state/accounting.py).
        import ray as _ray

        _ray.get(
            sink.put.remote(
                "blocking",
                bucket_id,
                {
                    "dropped_bands": n_dropped_bands,
                    "salted_bands": n_salted_bands,
                    "capped_groups": n_capped_groups,
                },
            )
        )
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    # one stats row per bucket rides along (band accounting for the
    # lineage manifest): id_a == -1 marks it, id_b = -(bucket+2) keeps it
    # unique so it survives pair dedup; callers filter by id_a == -1
    stats_a = np.array([-1], dtype=np.int64)
    return pa.table(
        {
            "id_a": pa.array(np.concatenate([a, stats_a])),
            "id_b": pa.array(
                np.concatenate([b, np.array([-(bucket_id + 2)], dtype=np.int64)])
            ),
            "dropped_bands": pa.array(
                np.concatenate(
                    [np.zeros(len(a), np.int32), np.array([n_dropped_bands], np.int32)]
                )
            ),
            "salted_bands": pa.array(
                np.concatenate(
                    [np.zeros(len(a), np.int32), np.array([n_salted_bands], np.int32)]
                )
            ),
            "capped_groups": pa.array(
                np.concatenate(
                    [np.zeros(len(a), np.int32), np.array([n_capped_groups], np.int32)]
                )
            ),
        }
    )


def candidate_pairs(
    features: "ray.data.Dataset",
    cfg: BlockingConfig,
    keep_stats: bool = False,
    stats_sink=None,
    coalesce: bool = True,
) -> "ray.data.Dataset":
    """features -> globally-unique candidate pairs (id_a < id_b).

    Band accounting (the no-silent-caps contract for stopband drops,
    salting and caps) has two transports:

    * ``keep_stats=True`` — per-bucket accounting rows (``id_a == -1``,
      unique ``id_b`` per bucket) flow THROUGH dedup and come out in the
      result, so a CHECKPOINTED pair stage carries its accounting in the
      Parquet itself; callers extract with :func:`extract_band_stats` /
      :func:`strip_band_stats`.
    * ``stats_sink=<StatsSink handle>`` — counts go to the keyed sink
      actor (state/accounting.py) and the result holds ONLY real pairs,
      so the stage can stream straight into the scorer with no
      materialization barrier (the no-checkpoint flagship path).

    ``coalesce=False`` skips the pre-shuffle repartition when the caller
    already sized the feature blocks to ``shuffle_partitions()`` (e.g.
    via ``override_num_blocks`` at the read) — each repartition is a
    full AllToAll barrier, and the round-5 profile showed the pair stage
    dominated by exchange coordination, not CPU."""
    from ..util import shuffle_partitions

    # exchange-key granularity: ~8 buckets per shuffle partition — coarse
    # enough that per-group overhead (map_groups slicing, table
    # construction, one accounting record) stays negligible, fine enough
    # that each group's lexsort stays cache-sized (round-5 microbench on
    # 19.2M band rows: 16 groups = 5.7s lexsort, 128 = 3.8s, 512 = 3.0s,
    # but 512 groups pay ~2x their sort savings back in per-group calls)
    n_buckets = min(cfg.num_buckets, 8 * shuffle_partitions())
    bands = features.map_batches(
        lambda b: expand_bands_batch(b, cfg, num_buckets=n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # coalesce the 16x-expanded band fragments before the sort shuffle:
    # the groupby exchanges num_blocks x num_partitions objects, so a
    # fragmented input makes coordination dominate (see shuffle_partitions)
    if coalesce:
        bands = bands.repartition(shuffle_partitions())
    grouped = bands.groupby("bucket").map_groups(
        lambda g: _emit_pairs_for_bucket(g, cfg, sink=stats_sink),
        batch_format="pyarrow",
    )
    if stats_sink is not None:
        return dedup_pairs(grouped, cfg.num_buckets, coalesce=False)
    if keep_stats:
        return dedup_pairs(grouped, cfg.num_buckets, carry_stats=True, coalesce=False)
    pairs = grouped.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["id_a"], pa.scalar(-1, pa.int64()))).select(
            ["id_a", "id_b"]
        ),
        batch_format="pyarrow",
    )
    return dedup_pairs(pairs, cfg.num_buckets, coalesce=False)


def extract_band_stats(pairs_with_stats: "ray.data.Dataset") -> dict:
    """Sum the band-accounting rows out of a ``keep_stats=True`` pair set
    (cheap: a filter map + tiny aggregate over the materialized stage)."""
    from ray.data.aggregate import Sum

    # a checkpoint written by a pre-keep_stats build has no stats columns;
    # treat it as zero accounting instead of failing the restore
    names = pairs_with_stats.schema().names
    if "dropped_bands" not in names:
        return {"dropped_bands": 0, "salted_bands": 0, "capped_groups": 0}
    # capped_groups was added after dropped/salted; older checkpoints
    # may carry only the first two columns
    stat_cols = [c for c in ("dropped_bands", "salted_bands", "capped_groups") if c in names]
    agg = pairs_with_stats.map_batches(
        lambda t: t.filter(pa.compute.equal(t["id_a"], pa.scalar(-1, pa.int64()))).select(
            stat_cols
        ),
        batch_format="pyarrow",
    ).aggregate(*[Sum(c) for c in stat_cols])
    out = {c: int(agg.get(f"sum({c})") or 0) for c in stat_cols}
    out.setdefault("capped_groups", 0)
    return out


def strip_band_stats(pairs_with_stats: "ray.data.Dataset") -> "ray.data.Dataset":
    """Real pairs only (id_a, id_b) from a ``keep_stats=True`` pair set."""
    return pairs_with_stats.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["id_a"], pa.scalar(-1, pa.int64()))).select(
            ["id_a", "id_b"]
        ),
        batch_format="pyarrow",
    )


def dedup_pairs(
    pairs: "ray.data.Dataset",
    num_buckets: int,
    carry_stats: bool = False,
    coalesce: bool = True,
) -> "ray.data.Dataset":
    """Global pair dedup (multi-band duplicates; D2 analogue —
    ``OnlyOnceDataset``, reference ``only_once_dataset.py:8-23`` — made
    deterministic under a shuffle: bucket by pair hash, unique within).

    ``carry_stats=True`` keeps the ``dropped_bands`` / ``salted_bands``
    columns through the shuffle (stats rows have unique keys, so they
    all survive; real pairs carry zeros — 8 B/row of extra width).
    ``coalesce=False`` skips the pre-shuffle repartition when the input
    block count already matches ``shuffle_partitions()`` (e.g. pair
    blocks straight out of the band groupby) — a no-op repartition is
    still a full AllToAll barrier."""

    from ..util import shuffle_partitions

    # same granularity rule as the band exchange (see candidate_pairs)
    n_buckets = min(num_buckets, 8 * shuffle_partitions())

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_pairs64

        if not carry_stats:
            batch = batch.select(["id_a", "id_b"])
        h = hash_pairs64(batch["id_a"].to_numpy(), batch["id_b"].to_numpy())
        return batch.append_column(
            "bucket", pa.array((h % U64(n_buckets)).astype(np.int32))
        )

    def uniq(group: pa.Table) -> pa.Table:
        a = group["id_a"].to_numpy()
        b = group["id_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (np.diff(a) != 0) | (np.diff(b) != 0)
        out = {"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])}
        if carry_stats:
            for c in ("dropped_bands", "salted_bands", "capped_groups"):
                if c in group.column_names:
                    out[c] = pa.array(group[c].to_numpy()[order][keep])
        return pa.table(out)

    bucketed = pairs.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    if coalesce:
        bucketed = bucketed.repartition(shuffle_partitions())
    return bucketed.groupby("bucket").map_groups(uniq, batch_format="pyarrow")
