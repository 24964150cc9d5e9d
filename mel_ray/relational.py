"""Relational operator implementations over the testdata tables.

Each function is one operator family from SURVEY.md §2 expressed
Ray-Data-first (vectorized ``map_batches``, ``groupby``/``aggregate``
shuffles, broadcast small sides) and has an exact DuckDB oracle in
``__ray_entry__.oracle_sql``.  Column names match the SQL on purpose —
the driver hash-compares values by sorted column name.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .util import read_parquet_clean
from ray.data.aggregate import Count, Max, Mean, Sum

from .util import auto_join_partitions, round_half_away


def _read(sf_dir: str, table: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# --- A3/A5: grouped aggregate (pre-aggregated per batch, then shuffled) ----
def grouped_agg(sf_dir: str):
    """lineitem -> per (returnflag, linestatus): sum qty, sum price, rows.

    Partial aggregation inside map_batches (one row per key per batch)
    shrinks the shuffle by ~batch_size/k — the pattern the guide calls
    combiner-before-groupby; the reference's grouped counts are A3
    (creator.py:151-171)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner — no pandas round-trip per batch.
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "n_rows"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )
    return out.map_batches(_round_cols(["sum_qty", "sum_price"]), batch_format="pyarrow")


def _round_cols(cols, nd=2):
    # half_towards_infinity == DuckDB round(); Arrow's default half-to-even
    # diverges on exact ties (root cause of the round-1 doc_quality mismatch).
    def f(t: pa.Table) -> pa.Table:
        for c in cols:
            if c in t.column_names:
                i = t.schema.get_field_index(c)
                t = t.set_column(
                    i,
                    c,
                    pc.round(
                        pc.cast(t[c], pa.float64()),
                        ndigits=nd,
                        round_mode="half_towards_infinity",
                    ),
                )
        return t

    return f


# --- M1-M3/F: vectorized filter + project + compute -----------------------
def filter_project(sf_dir: str):
    """shipped-before-1996 revenue per returnflag (Arrow kernels only)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"])

    def f(t: pa.Table) -> pa.Table:
        import datetime

        cutoff = pc.cast(
            pa.scalar(datetime.date(1996, 1, 1)), t.schema.field("l_shipdate").type
        )
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_returnflag": t["l_returnflag"], "revenue": rev})

    out = ds.map_batches(f, batch_format="pyarrow").groupby("l_returnflag").aggregate(
        Sum("revenue", alias_name="revenue")
    )
    return out.map_batches(_round_cols(["revenue"]), batch_format="pyarrow")


# --- A1/A2/O2: grouped top-k / per-key head --------------------------------
def _lexsort_key(col, ascending: bool) -> np.ndarray:
    """One lexsort key array for an Arrow column; strings become
    sorted-dictionary ranks so lexicographic order survives without
    sorting object arrays row-wise (dictionaries are small)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        enc = col.dictionary_encode()
        dvals = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(dvals), dtype=np.int64)
        rank[np.argsort(dvals, kind="stable")] = np.arange(len(dvals))
        key = rank[enc.indices.to_numpy()]
    else:
        key = col.to_numpy(zero_copy_only=False)
    if not ascending:
        key = -key.astype(np.float64) if key.dtype.kind == "f" else -key.astype(np.int64)
    return key


def _bucketed_head(ds, key_col: str, order: list[tuple[str, bool]], k: int, out_cols):
    """Per-key head-k under (col, ascending) sort order, via ONE bucketed
    groupby and NumPy run-detection inside each bucket (the blocking.py
    pattern): ALL keys of a bucket are ranked by a single lexsort, so a
    hot key is just a longer run inside one vectorized sort — never a
    per-group pandas sort straggler, never per-group Python dispatch."""
    from .functions.hashing import U64, hash_strings64, splitmix64
    from .util import shuffle_partitions

    num_buckets = shuffle_partitions()

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy().astype(np.int64).view(U64))
        else:
            h = hash_strings64(col)
        return t.append_column("bucket", pa.array((h % U64(num_buckets)).astype(np.int32)))

    def head(group: pa.Table) -> pa.Table:
        keys = group[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.dictionary_encode().indices.to_numpy()
        sort_keys = [_lexsort_key(group[c], asc) for c, asc in reversed(order)]
        o = np.lexsort(tuple(sort_keys) + (codes,))
        codes_s = codes[o]
        run_start = np.ones(len(codes_s), dtype=bool)
        run_start[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(codes_s)))
        rank = np.arange(len(codes_s)) - np.repeat(starts, lens)
        return group.take(pa.array(o[rank < k])).select(out_cols)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(head, batch_format="pyarrow")
    )


def grouped_topk(sf_dir: str, k: int = 3):
    """top-k parts per brand by (retailprice desc, partkey asc) — the
    alias-table "most_common(R) per mention" shape (all_languages.py:115)."""
    ds = _read(sf_dir, "part", ["p_brand", "p_partkey", "p_retailprice"])
    return _bucketed_head(
        ds,
        "p_brand",
        [("p_retailprice", False), ("p_partkey", True)],
        k,
        ["p_brand", "p_partkey", "p_retailprice"],
    )


# --- A4/J8: grouped argmax with deterministic tie-break -------------------
def grouped_argmax(sf_dir: str):
    """per nation: the customer with max acctbal (ties -> min custkey) —
    the "elect canonical page per entity" recast (creator.py:179-206)."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_acctbal"])
    return _bucketed_head(
        ds,
        "c_nationkey",
        [("c_acctbal", False), ("c_custkey", True)],
        1,
        ["c_nationkey", "c_custkey", "c_acctbal"],
    )


# --- J2: broadcast (map-side) join ----------------------------------------
def broadcast_join(sf_dir: str):
    """revenue per p_brand: part is the small side, shipped via ray.put
    once and probed per batch (the qid-remap broadcast pattern,
    qids_remap.py:35-55) — no shuffle of the big side."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    lookup_ref = ray.put(
        (pa.array(part.p_partkey.to_numpy()), pa.array(part.p_brand, pa.string()))
    )
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    class Probe:
        def __init__(self, ref):
            # broadcast side fetched once per actor; probe is a vectorized
            # Arrow hash lookup (pc.index_in + pc.take), no per-row Python
            self.keys, self.values = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["l_partkey"], value_set=self.keys)
            brands = pc.take(self.values, idx)
            rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return pa.table({"p_brand": brands, "revenue": rev})

    out = (
        ds.map_batches(Probe, fn_constructor_args=(lookup_ref,), batch_format="pyarrow", concurrency=2)
        .groupby("p_brand")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return out.map_batches(_round_cols(["revenue"]), batch_format="pyarrow")


# --- J1: large-large hash join --------------------------------------------
def hash_join(sf_dir: str):
    """lineitem ⋈ orders (hash-shuffle join) -> per orderpriority count +
    revenue (J1: the token->embedding hash join, find_recall.py:120-133)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=auto_join_partitions(None),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderpriority": t["o_orderpriority"], "revenue": r})

    out = (
        joined.map_batches(rev, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("revenue", alias_name="revenue"))
    )
    return out.map_batches(_round_cols(["revenue"]), batch_format="pyarrow")


# --- M14/J3: semi join; J5/D5: anti join ----------------------------------
def _urgent_custkeys_ref(sf_dir: str) -> "ray.ObjectRef":
    """ObjectRef to the sorted unique URGENT custkeys, assembled by ONE
    Ray task from the materialized key blocks (the bloom_semi_join
    assembly-task pattern): the driver only ever holds block REFS — the
    key data itself never transits the driver, it moves plasma-to-plasma
    and is fetched zero-copy by each probe task."""
    keys_ds = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    @ray.remote(num_cpus=0.25)
    def assemble(*tables) -> pa.Array:
        nonempty = [t for t in tables if len(t)]
        if not nonempty:
            return pa.array([], pa.int64())
        ks = pa.concat_tables(nonempty)["o_custkey"]
        return pa.array(np.unique(ks.to_numpy(zero_copy_only=False)))

    return assemble.remote(*keys_ds.to_arrow_refs())


def semi_join(sf_dir: str):
    """customers with >=1 URGENT order — broadcast key-set semi-join
    (``pc.is_in``; _remove_when_qid_missing, datasets.py:95-101).  The
    key set is built worker-side and broadcast by ref, never collected
    on the driver."""
    kref = _urgent_custkeys_ref(sf_dir)
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def probe(t: pa.Table) -> pa.Table:
        keys = ray.get(kref)  # zero-copy plasma read per task
        return t.filter(pc.is_in(t["c_custkey"], value_set=keys))

    return ds.map_batches(probe, batch_format="pyarrow")


def anti_join(sf_dir: str):
    """customers with no URGENT order (inverted membership; the
    negative-sampler anti-join, negative_sampler.py:98-109)."""
    kref = _urgent_custkeys_ref(sf_dir)
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def probe(t: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=keys)))

    return ds.map_batches(probe, batch_format="pyarrow")


# --- O8: distribution-weighted sampling -------------------------------------
def weighted_sample(sf_dir: str, k: int = 50):
    """k orders sampled WITHOUT replacement with probability proportional
    to ``o_totalprice`` — the reference's distribution-weighted negative
    sampler (``np.random.choice(p=qids_distribution)``,
    negative_sampler.py:176-190) made deterministic and distributed.

    Efraimidis-Spirakis priority sampling: rank = -ln(u)/w with a
    md5-derived uniform u (DuckDB's ``md5_number_lower`` = little-endian
    of digest bytes 8..16 — mirrored bit-for-bit here), take the k
    smallest ranks.  Ranks are rounded to 12 decimals with an id
    tie-break so a <=1-ulp ``ln`` difference between engines cannot
    flip the boundary.  Scale shape: each batch keeps only its local
    top-k (combiner), so the final sort sees #blocks x k rows."""
    import hashlib

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        w = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        dig = b"".join(hashlib.md5(str(int(x)).encode()).digest() for x in okey.tolist())
        lo = np.frombuffer(dig, np.uint8).reshape(-1, 16)[:, 8:].copy().view("<u8")[:, 0]
        u = lo.astype(np.float64) / 18446744073709551616.0
        r = np.round(-np.log(u) / w, 12)
        order = np.lexsort((okey, r))[:k]  # local top-k combiner
        return pa.table(
            {
                "o_orderkey": pa.array(okey[order]),
                "o_totalprice": pa.array(w[order]),
                "r": pa.array(r[order]),
            }
        )

    out = ds.map_batches(keyed, batch_format="pyarrow").sort(["r", "o_orderkey"]).limit(k)
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_totalprice"]), batch_format="pyarrow"
    )


def bloom_semi_join(sf_dir: str):
    """Same result as :func:`semi_join`, via the 100-TB join plan: a
    compact broadcast Bloom filter pre-filters the probe side inside
    ``map_batches`` before the exact membership check.

    Scale shape: at 100 TB the probe side cannot be shuffled and the
    build-side key SET may be too big to broadcast — but its Bloom
    bitset (~2 bytes/key at 0.05% fpp) fits any worker heap.  The
    bitset is assembled by ONE Ray task from the materialized key
    blocks (the driver only holds refs, the `_collect_features_ref`
    pattern) and shared via the object store (`ray.put` once,
    zero-copy `ray.get` per task).  The Bloom pass drops the
    non-matching bulk; the exact verify then runs on the survivors
    only (here the broadcast key set; at scale, a partitioned
    semi-join over the ~key-sized remainder).  False positives are
    removed by the verify, so results are exact — the oracle is the
    plain semi-join SQL."""
    _BLOOM_K = 8

    keys_ds = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    refs = keys_ds.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def build_bloom(*tables):
        import numpy as _np
        import pyarrow as _pa

        from .functions.hashing import splitmix64

        keys = _pa.concat_tables([t for t in tables if len(t)])["o_custkey"]
        x = _np.unique(keys.to_numpy(zero_copy_only=False)).astype(_np.uint64)
        n = max(len(x), 1)
        m = 1 << max(int(n * 16 - 1).bit_length(), 10)  # pow2 >= 16n
        h1 = splitmix64(x ^ _np.uint64(0x9E3779B97F4A7C15))
        h2 = splitmix64(x ^ _np.uint64(0xC2B2AE3D27D4EB4F)) | _np.uint64(1)
        bits = _np.zeros(m // 64, dtype=_np.uint64)
        mask = _np.uint64(m - 1)
        for i in range(_BLOOM_K):
            idx = (h1 + _np.uint64(i) * h2) & mask
            _np.bitwise_or.at(bits, (idx >> _np.uint64(6)), _np.uint64(1) << (idx & _np.uint64(63)))
        exact = _np.sort(x)
        return bits, exact

    bloom_ref = build_bloom.remote(*refs)

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def probe(t: pa.Table) -> pa.Table:
        from .functions.hashing import splitmix64

        bits, exact = ray.get(bloom_ref)  # zero-copy plasma read per task
        x = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = np.uint64(len(bits) * 64)
        mask = m - np.uint64(1)
        h1 = splitmix64(x ^ np.uint64(0x9E3779B97F4A7C15))
        h2 = splitmix64(x ^ np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        hit = np.ones(len(x), dtype=bool)
        for i in range(_BLOOM_K):
            idx = (h1 + np.uint64(i) * h2) & mask
            hit &= (bits[(idx >> np.uint64(6))] >> (idx & np.uint64(63))) & np.uint64(1) != 0
        t = t.filter(pa.array(hit))  # Bloom pre-filter (no false negatives)
        # exact verify on the survivors only (kills false positives)
        xs = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(exact) == 0:
            return t.filter(pa.array(np.zeros(len(xs), dtype=bool)))
        pos = np.minimum(np.searchsorted(exact, xs), len(exact) - 1)
        return t.filter(pa.array(exact[pos] == xs))

    return ds.map_batches(probe, batch_format="pyarrow")


# --- D1/D3: union + distinct ----------------------------------------------
def union_distinct(sf_dir: str):
    """distinct nation keys present in customer ∪ supplier (ChainStep +
    dedup, utils/chain.py:5-17 + only_once_dataset.py:8-23)."""
    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    u = c.union(s)
    return u.groupby("nationkey").aggregate(Count(alias_name="n_refs"))


# --- O3/O9: global sort + limit -------------------------------------------
def sort_limit(sf_dir: str, n: int = 10):
    """top-n orders by totalprice (range-shuffle sort, deterministic
    tie-break on orderkey; _sort_by_output analogue, loaders.py:23-33)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    # sort by (-price, key) via a compound sort key for a deterministic order
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(n)
    return top


def topk_global(sf_dir: str, n: int = 10):
    """Exact global top-n WITHOUT a global sort: per-batch local top-n
    (a combiner — the exchange then carries at most n rows per block
    instead of every row), one tiny single-block merge at the end.
    ``sort_limit`` keeps the full range-partitioned sort for when a
    totally ordered OUTPUT is the semantic (O3); this is the right plan
    when only the head is needed — at 100 TB the difference is an
    all-to-all shuffle vs a kilobyte collect."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def top(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((key, -price))[:n]
        return pa.table(
            {"o_orderkey": pa.array(key[idx]), "o_totalprice": pa.array(price[idx])}
        )

    local = ds.map_batches(top, batch_format="pyarrow", zero_copy_batch=True)
    # all surviving candidates (<= n per block) fit one block
    return local.repartition(1).map_batches(top, batch_format="pyarrow")


# --- O10: per-key cap ------------------------------------------------------
def per_key_cap(sf_dir: str, cap: int = 2):
    """<= cap lineitems per order, in linenumber order (max_per_qid cap,
    index/index.py:102-120)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    # l_quantity breaks (orderkey, linenumber) ties deterministically
    return _bucketed_head(
        ds,
        "l_orderkey",
        [("l_linenumber", True), ("l_quantity", True)],
        cap,
        ["l_orderkey", "l_linenumber", "l_quantity"],
    )


# --- A10: distinct count ---------------------------------------------------
def distinct_count(sf_dir: str):
    """distinct customers per orderpriority (np.unique diagnostics, A10)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-batch distinct (group_by with no aggregates)
        return t.group_by(["o_orderpriority", "o_custkey"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_custkey"])
        .aggregate(Count(alias_name="c"))
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_customers"))
    )


# --- A10 at scale: mergeable-sketch approximate distinct -------------------
def approx_distinct_count(sf_dir: str, b: int = 12):
    """approximate distinct customers per orderpriority via a grouped
    HyperLogLog aggregate (functions/sketch.py): fixed 2^b-byte register
    accumulator per group, merged associatively — the sketch path for
    ``distinct_count`` when one-row-per-distinct-key no longer fits a
    shuffle.  Accuracy ~1.04/sqrt(2^b) (±1.6% at b=12); asserted within
    5% of the exact counts in tests (no SQL oracle — approximate)."""
    from ray.data.aggregate import AggregateFn

    from .functions.sketch import hash_keys, hll_estimate, hll_merge, hll_partial

    m = 1 << b
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def accumulate_block(reg: np.ndarray, block: pa.Table) -> np.ndarray:
        h = hash_keys(block.column("o_custkey").to_numpy())
        return hll_merge(reg, hll_partial(h, b))

    hll = AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.uint8),
        accumulate_block=accumulate_block,
        merge=hll_merge,
        name="hll",
    )
    agg = ds.groupby("o_orderpriority").aggregate(hll)

    def finalize(t: pa.Table) -> pa.Table:
        regs = t["hll"].to_pylist()
        est = [int(round(hll_estimate(np.asarray(r, dtype=np.uint8)))) for r in regs]
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "approx_customers": pa.array(est, pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# --- A7/A8: mean aggregate -------------------------------------------------
def mean_agg(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = ds.groupby("l_returnflag").aggregate(Mean("l_quantity", alias_name="avg_qty"))
    return out.map_batches(_round_cols(["avg_qty"], nd=4), batch_format="pyarrow")


# --- T10: streaming grouped statistics (RunningAverages analog) ------------
def grouped_stats(sf_dir: str):
    """Per-key streaming statistics: count, mean, population variance,
    min, max — the dataflow form of the reference's ``RunningAverages``
    telemetry (utils/running_averages.py:4-58), generalized from a
    bounded deque to exact distributed moments.

    Scale shape: each batch emits ONE partial row per key (count, sum,
    sum-of-squares, min, max — all associative), so the shuffle is
    key-sized, not row-sized; moments are finalized after the combine.
    The variance expression mirrors the oracle SQL operation-for-
    operation (exact integer-valued sums in float64), so values are
    bit-identical to DuckDB's."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.float64())
        t2 = pa.table(
            {"l_returnflag": t["l_returnflag"], "q": q, "qq": pc.multiply(q, q)}
        )
        g = t2.group_by(["l_returnflag"]).aggregate(
            [("q", "sum"), ("qq", "sum"), ("q", "min"), ("q", "max"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "s", "ss", "mn", "mx", "n"]
        )

    combined = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Min("mn", alias_name="min_qty"),
            Max("mx", alias_name="max_qty"),
            Sum("n", alias_name="n_rows"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_rows"], pa.float64())
        mean = pc.divide(t["s"], n)
        # same expression tree as the oracle: ss/n - (s/n)*(s/n)
        var = pc.subtract(pc.divide(t["ss"], n), pc.multiply(mean, mean))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
                "mean_qty": mean,
                "var_qty": var,
                "min_qty": t["min_qty"],
                "max_qty": t["max_qty"],
            }
        )

    return combined.map_batches(finalize, batch_format="pyarrow")


# --- A5: grouped count -> normalized distribution --------------------------
def event_type_distribution(sf_dir: str):
    """count per event_type + normalized share (A5,
    ``utils/calculate_qids_distribution.py:7-21``: global count-by-key ->
    probability vector).  The total is a metadata-only ``count()``; the
    normalize is a broadcast scalar, no second shuffle."""
    ds = _read(sf_dir, "events", ["event_type"])
    total = float(ds.count())
    counts = ds.groupby("event_type").aggregate(Count(alias_name="n"))

    def f(t: pa.Table) -> pa.Table:
        share = pc.round(
            pc.divide(pc.cast(t["n"], pa.float64()), total),
            ndigits=6,
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "share": share,
            }
        )

    return counts.map_batches(f, batch_format="pyarrow")


# --- O4: first-n-distinct per key ------------------------------------------
def first_n_distinct(sf_dir: str, n: int = 3):
    """per user: the first ``n`` distinct event types in first-seen order
    (O4 ``get_unique_n``, recall_calculator.py:13-20 — distinct-limit
    preserving stream order, made deterministic as min-event-time order
    with type tie-break).  Composition: grouped min(ts) then grouped
    top-n — two small shuffles on already-aggregated rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    firsts = (
        ds.groupby(["user_id", "event_type"])
        .min("ts")
        .map_batches(
            lambda t: t.rename_columns(["user_id", "event_type", "first_ts"]),
            batch_format="pyarrow",
        )
    )

    out = _bucketed_head(
        firsts,
        "user_id",
        [("first_ts", True), ("event_type", True)],
        n,
        ["user_id", "event_type", "first_ts"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": t["event_type"],
                "first_ts": pc.cast(t["first_ts"], pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )


# --- §2.9: tumbling event-time window -------------------------------------
def windowed_agg(sf_dir: str):
    """events -> per (event_type, hour window): count + sum(value).
    Ray Data has no watermarks; bounded event-time windows are exactly a
    grouped aggregate on the truncated timestamp (SURVEY.md §2.9)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"event_type": t["event_type"], "window_start": w, "value": t["value"]})

    out = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(_round_cols(["sum_value"]), batch_format="pyarrow")


# --- A1 full analogue: alias table ----------------------------------------
def alias_table(sf_dir: str, r: int = 2):
    """per user: top-R event types by count (count desc, type asc) — the
    mention->top-R-QIDs alias table verbatim (all_languages.py:93-115)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).aggregate(Count(alias_name="n"))
    return _bucketed_head(
        counts,
        "user_id",
        [("n", False), ("event_type", True)],
        r,
        ["user_id", "event_type", "n"],
    )


# --- S4/O6: in-batch-unique training batcher --------------------------------
def unique_batcher(sf_dir: str):
    """Assign every event to a training batch such that NO batch holds
    two rows of the same event_type — the reference's BatcherDataset
    contract (in-batch-unique QIDs,
    ``finetunings/generate_epochs/datasets.py:22-101``) made
    deterministic: batch_id = the row's md5-rank WITHIN its label, so
    each label contributes at most one row per batch and the assignment
    is scheduling-independent with an exact SQL mirror (row_number over
    the label partition).

    Scale shape: ONE bucketed groupby on hash(label); ranking inside a
    bucket is a single lexsort + run-detection over all labels of the
    bucket (the blocking.py pattern)."""
    import hashlib

    from .functions.hashing import U64, hash_strings64

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    from .util import shuffle_partitions

    num_buckets = shuffle_partitions()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash_strings64(t["event_type"])
        return t.append_column(
            "bucket", pa.array((h % U64(num_buckets)).astype(np.int32))
        )

    def rank(group: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        eid = group["event_id"].to_numpy()
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy()
        digests = b"".join(md5(str(e).encode()).digest() for e in eid.tolist())
        h = np.frombuffer(digests, dtype=">u8").reshape(-1, 2).astype(np.uint64)
        order = np.lexsort((eid, h[:, 1], h[:, 0], codes))
        codes_s = codes[order]
        run_start = np.ones(len(codes_s), dtype=bool)
        run_start[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(codes_s)))
        batch_id = np.arange(len(codes_s)) - np.repeat(starts, lens)
        out = np.empty(len(codes_s), dtype=np.int64)
        out[order] = batch_id
        return pa.table(
            {
                "event_id": pa.array(eid),
                "event_type": et,
                "batch_id": pa.array(out),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank, batch_format="pyarrow")
    )


# --- T7/O7: deterministic negative sampling --------------------------------
def negative_sampling(sf_dir: str, k: int = 2):
    """Per event ("mention"), ``k`` deterministic NEGATIVE event types
    ("entities" != the gold one), ranked by ``md5(event_id:type)`` — the
    reference's negative sampler recast without RNG state
    (``models/negative_sampler.py:126-199``: sample negatives per
    mention EXCLUDING the gold entity — the anti-join — then take K;
    hash-ranking replaces the torch generator so the result is
    scheduling-independent and has an exact SQL mirror).

    Scale shape: the candidate entity table is broadcast (it is the
    genuinely small side — the reference's is the entity embedding
    index); per batch the (row x candidate) expansion is bounded by
    k+|types| and ranked with ONE global lexsort keyed by row — no
    shuffle at all, the output streams."""
    import hashlib

    from .util import unique_column_ref

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    # candidate type domain assembled worker-side (sorted pa.Array by
    # ref); the domain never transits the driver
    types_ref = unique_column_ref(
        _read(sf_dir, "events", ["event_type"]), "event_type"
    )

    class Sample:
        def __init__(self, ref):
            self.types = ray.get(ref).to_pylist()

        def __call__(self, t: pa.Table) -> pa.Table:
            md5 = hashlib.md5
            eid = t["event_id"].to_numpy()
            gold = t["event_type"].to_numpy(zero_copy_only=False)
            n = len(eid)
            C = len(self.types)
            # (n, C) candidate grid minus each row's gold column (types
            # sorted -> searchsorted gives the gold's candidate index)
            tarr = np.asarray(self.types, dtype=object)
            gold_idx = np.searchsorted(tarr, gold.astype(object))
            cand_idx = np.broadcast_to(np.arange(C), (n, C))
            keep = (cand_idx != gold_idx[:, None]).ravel()
            rows = np.repeat(np.arange(n), C)[keep]
            cands = cand_idx.ravel()[keep]
            digests = b"".join(
                md5(f"{eid[r]}:{self.types[c]}".encode()).digest()
                for r, c in zip(rows, cands)
            )
            h = np.frombuffer(digests, dtype=">u8").reshape(-1, 2).astype(np.uint64)
            order = np.lexsort((cands, h[:, 1], h[:, 0], rows))
            rows_s = rows[order]
            rank = np.arange(len(rows_s)) - np.searchsorted(rows_s, rows_s)
            sel = order[rank < k]
            out_rank = rank[rank < k] + 1
            return pa.table(
                {
                    "event_id": pa.array(eid[rows[sel]]),
                    "neg_type": pa.array(
                        [self.types[c] for c in cands[sel]], pa.string()
                    ),
                    "neg_rank": pa.array(out_rank.astype(np.int64)),
                }
            )

    return ds.map_batches(
        Sample, fn_constructor_args=(types_ref,), batch_format="pyarrow", concurrency=2
    )


# --- O9 deterministic variant: per-key hash-ordered sample ------------------
def stratified_sample(sf_dir: str, n: int = 20):
    """Deterministic stratified sample: per event_type, the ``n`` rows
    with the smallest ``md5(event_id)`` — reproducible sampling with an
    exact SQL mirror (``ORDER BY md5(...)`` per partition), unlike the
    seed-dependent ``shuffled_cap`` (O9).

    Scale shape: per-batch COMBINER pre-cap (each batch contributes at
    most n rows per stratum to the exchange), then one tiny per-stratum
    top-n.  The md5 call is per-row (oracle parity — DuckDB md5 has no
    batch form) but runs on the short decimal id string, never content,
    and only survives until the local cap."""
    import hashlib

    from .functions.hashing import string_array_buffers

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def md5_words(t: pa.Table) -> np.ndarray:
        s = pc.cast(t["event_id"], pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        data, offsets = string_array_buffers(s)
        mv = memoryview(data)
        md5 = hashlib.md5
        digests = b"".join(
            md5(mv[offsets[i] : offsets[i + 1]]).digest() for i in range(len(t))
        )
        # hex-string order == big-endian numeric order of the 128-bit value
        return np.frombuffer(digests, dtype=">u8").reshape(-1, 2).astype(np.uint64)

    def local_cap(t: pa.Table) -> pa.Table:
        d = md5_words(t)
        eid = t["event_id"].to_numpy()
        codes = pc.dictionary_encode(
            t["event_type"].combine_chunks()
            if isinstance(t["event_type"], pa.ChunkedArray)
            else t["event_type"]
        ).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, d[:, 1], d[:, 0], codes))
        c_s = codes[order]
        run_start = np.ones(len(c_s), dtype=bool)
        run_start[1:] = c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(run_start)
        rank = np.arange(len(c_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(c_s)))
        )
        keep = order[rank < n]
        return pa.table(
            {
                "event_id": pa.array(eid[keep]),
                "event_type": t["event_type"].take(pa.array(keep)),
                "h_hi": pa.array(d[keep, 0].view(np.int64)),
                "h_lo": pa.array(d[keep, 1].view(np.int64)),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        hi = g["h_hi"].to_numpy().view(np.uint64)
        lo = g["h_lo"].to_numpy().view(np.uint64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, lo, hi))[:n]
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "event_type": g["event_type"].take(pa.array(order)),
            }
        )

    return (
        ds.map_batches(local_cap, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(final, batch_format="pyarrow")
    )


# --- A11: exact grouped quantiles via (key,value) count histogram ----------
def grouped_quantile(sf_dir: str, qs=((0.5, "q50"), (0.95, "q95"))):
    """Exact interpolated quantiles (DuckDB ``quantile_cont`` semantics)
    of ``l_quantity`` per ``l_returnflag``.

    Scale path: a quantile over a BOUNDED-DOMAIN column never sorts or
    collects the data — pass 1 reduces to per-(key, value) counts
    (Arrow combiner inside ``map_batches``, then a groupby whose payload
    is O(keys × distinct-values), independent of row count), pass 2
    interpolates from cumulative counts inside ``map_groups`` on the
    tiny histogram.  Continuous domains take the same plan over
    fixed-width bins (approx) or a two-pass exact select.  Interpolation
    is ``lo + frac·(hi − lo)`` on ``pos = q·(n−1)``, matching DuckDB's
    continuous interpolator bit-for-bit before the shared round(4).
    Reference analogue: grouped stats A7/A9 (SURVEY.md §2;
    src/models/recall_calculator.py aggregates per-entity score stats
    the same two-pass way).
    """
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate([([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_quantity", "n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("n", alias_name="n"))
    )

    return hist.groupby("l_returnflag").map_groups(
        _interp_quantiles("l_returnflag", "l_quantity", qs), batch_format="pyarrow"
    )


# --- J9: overlapping-interval (range) join, aggregated per interval --------
def range_join(
    sf_dir: str, step: float = 5000.0, width: float = 15000.0, nbands: int = 100
):
    """Non-equi range join: orders × overlapping price bands
    ``[b·step, b·step + width)``, aggregated per band.

    True interval-join semantics — bands overlap, so one row joins up
    to ``width/step`` bands (not binning).  The big side streams; each
    batch finds its matching band RANGE per row with two
    ``searchsorted`` probes against the sorted lo/hi edges (the exact
    ``>=`` / ``<`` comparisons the SQL oracle uses — no float-division
    boundary risk), expands (row, band) pairs vectorized, and partially
    aggregates with ``bincount`` so AT MOST ``nbands`` rows per batch
    enter the shuffle — replicated join rows never leave the batch.
    Assumes interval lo AND hi edges are each sorted (true for sliding
    bands; arbitrary interval sets would grid-bin first).  The
    row-emitting form is the same probe minus the bincount tail.
    (J family, SURVEY.md §2; oracle joins the same generate_series
    bands.)
    """
    los = np.arange(nbands, dtype=np.float64) * step
    his = los + width

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def probe(t: pa.Table) -> pa.Table:
        x = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b_start, counts = interval_probe(x, los, his)
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "sum_price": pa.array([], pa.float64()),
                }
            )
        starts_rep = np.repeat(b_start, counts)
        seg0 = np.concatenate(([0], counts.cumsum()[:-1]))
        bands = starts_rep + (np.arange(total) - np.repeat(seg0, counts))
        price_rep = np.repeat(x, counts)
        n_b = np.bincount(bands, minlength=nbands)
        s_b = np.bincount(bands, weights=price_rep, minlength=nbands)
        keep = np.flatnonzero(n_b)
        return pa.table(
            {
                "band_id": pa.array(keep, pa.int64()),
                "n_orders": pa.array(n_b[keep], pa.int64()),
                "sum_price": pa.array(s_b[keep], pa.float64()),
            }
        )

    out = (
        ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band_id")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_price", alias_name="sum_price"),
        )
        .sort("band_id")
    )
    return out.map_batches(_round_cols(["sum_price"]), batch_format="pyarrow")


def interval_probe(
    x: np.ndarray, los: np.ndarray, his: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per row: the contiguous run of intervals matching
    ``lo <= x < hi``, as ``(first_index, count)``.

    Two ``searchsorted`` probes per batch — the EXACT ``>=`` / ``<``
    comparisons a SQL range join uses, no float-division boundary risk.
    Requires ``los`` and ``his`` each sorted ascending (true for sliding
    bands; arbitrary interval sets would grid-bin first), which makes
    every row's matching set a contiguous index run."""
    b_end = np.searchsorted(los, x, side="right") - 1  # max b: lo_b <= x
    b_start = np.searchsorted(his, x, side="right")  # min b: x < hi_b
    return b_start, np.maximum(b_end - b_start + 1, 0)


# --- A11b: approx grouped quantile for CONTINUOUS domains ------------------
def approx_quantile(
    sf_dir: str,
    nbins: int = 8192,
    lo: float = 0.0,
    hi: float = 512000.0,
    qs=((0.5, "q50"), (0.95, "q95")),
):
    """Approximate grouped quantiles of ``o_totalprice`` per
    ``o_orderpriority`` via a fixed-width histogram — the scale path
    ``grouped_quantile``'s docstring promises for continuous domains.

    Per batch each row maps to one of ``nbins`` equi-width bins
    (vectorized floor-divide), Arrow-combined to per-(key, bin) counts;
    the shuffle payload is O(keys × nbins) regardless of row count.
    The final ``map_groups`` interpolates exactly as the exact op but
    over bin MIDPOINTS, so the absolute error is bounded by one bin
    width ((hi−lo)/nbins ≈ 62 at the defaults) — asserted in tests
    against the exact quantile.  Pairs with ``grouped_quantile`` the
    way ``approx_distinct_count`` (HLL) pairs with ``distinct_count``.
    """
    w = (hi - lo) / nbins
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.clip(((x - lo) / w).astype(np.int64), 0, nbins - 1)
        mid = lo + (b.astype(np.float64) + 0.5) * w
        g = (
            pa.table({"o_orderpriority": t["o_orderpriority"], "mid": mid})
            .group_by(["o_orderpriority", "mid"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["o_orderpriority", "mid", "n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderpriority", "mid"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return hist.groupby("o_orderpriority").map_groups(
        _interp_quantiles("o_orderpriority", "mid", qs), batch_format="pyarrow"
    )


def _interp_quantiles(key_col: str, val_col: str, qs):
    """Group fn: interpolated quantiles from a (value, count) histogram
    — ``lo + frac·(hi − lo)`` at ``pos = q·(n−1)``, DuckDB
    ``quantile_cont`` semantics."""

    def quantiles(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g[val_col])
        vals = g[val_col].take(order).to_numpy(zero_copy_only=False)
        cum = g["n"].take(order).to_numpy(zero_copy_only=False).cumsum()
        n = int(cum[-1])
        out = {key_col: [g[key_col][0].as_py()]}
        for q, name in qs:
            pos = q * (n - 1)
            lo_i = int(np.floor(pos))
            hi_i = int(np.ceil(pos))
            v_lo = vals[np.searchsorted(cum, lo_i, side="right")]
            v_hi = vals[np.searchsorted(cum, hi_i, side="right")]
            x = v_lo + (pos - lo_i) * (v_hi - v_lo)
            out[name] = [float(round_half_away(x, 4))]
        return pa.table(out)

    return quantiles


# --- ER blocking family: sorted-neighborhood -------------------------------
def sorted_neighborhood_pairs(sf_dir: str, w: int = 5):
    """Sorted-neighborhood blocking — the OTHER classic entity-resolution
    blocking family next to LSH banding (Hernandez-Stolfo merge/purge):
    sort by a blocking key and emit candidate pairs within a sliding
    window of ``w`` consecutive records.

    Ray plan: range-partitioned sort → materialized ordered blocks →
    one task per block, each fetching its OWN block plus the first
    ``w−1`` rows borrowed from the following block(s), so window pairs
    crossing block boundaries are emitted exactly once and the pair set
    is byte-identical to the SQL ``row_number()`` formulation.  Work
    per task is O(block·w); nothing global ever assembles.

    The boundary heads (first ``w−1`` keys of every block) are sliced
    ONCE by tiny remote tasks and broadcast — a window task never
    fetches a whole following block just to borrow w−1 rows (a skewed
    neighbor block would otherwise be fully re-transferred per task).
    The exactly-once guarantee rides on ``to_arrow_refs()`` returning
    blocks in global sorted order; the head slices carry each block's
    boundary sort keys, and the monotonicity assertion below pins that
    assumption at runtime instead of trusting it silently."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).sort(
        ["c_acctbal", "c_custkey"]
    )
    refs = ds.materialize().to_arrow_refs()
    nb = len(refs)

    def _head_meta(tbl: pa.Table, k: int):
        keys = tbl["c_custkey"].to_numpy().astype(np.int64)
        bal = tbl["c_acctbal"].to_numpy(zero_copy_only=False)
        if not len(keys):
            return keys[:0], None, None
        return keys[:k], (float(bal[0]), int(keys[0])), (float(bal[-1]), int(keys[-1]))

    head_task = ray.remote(num_cpus=0.25)(_head_meta)
    metas = ray.get([head_task.remote(r, w - 1) for r in refs])
    prev = None
    for _, lo, hi in metas:
        if lo is None:
            continue
        assert prev is None or prev <= lo, (
            "to_arrow_refs() returned sort blocks out of global order; "
            "sorted-neighborhood windowing requires ordered blocks"
        )
        prev = hi
    heads_ref = ray.put([m[0] for m in metas])
    tasks = ray.data.from_arrow(
        pa.table({"b": pa.array(np.arange(nb, dtype=np.int64))})
    ).repartition(max(2, min(nb, 16)))

    class WindowPairs:
        def __init__(self, refs, heads_ref, w):
            self.refs, self.heads, self.w = list(refs), ray.get(heads_ref), w

        def __call__(self, t: pa.Table) -> pa.Table:
            out_a, out_b, out_d = [], [], []
            for b in t["b"].to_numpy():
                b = int(b)
                keys = ray.get(self.refs[b])["c_custkey"].to_numpy().astype(np.int64)
                n_own = len(keys)
                if n_own == 0:
                    continue
                # borrow the next w-1 rows from the broadcast head slices,
                # spanning blocks if they are tiny
                need, nxt, borrowed = self.w - 1, b + 1, []
                while need > 0 and nxt < len(self.heads):
                    ks = self.heads[nxt]
                    borrowed.append(ks[:need])
                    need -= min(need, len(ks))
                    nxt += 1
                aug = np.concatenate([keys] + borrowed) if borrowed else keys
                for j in range(1, self.w):
                    m = min(n_own, len(aug) - j)
                    if m <= 0:
                        break
                    out_a.append(aug[:m])
                    out_b.append(aug[j : j + m])
                    out_d.append(np.full(m, j, dtype=np.int64))
            if not out_a:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "dist": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "id_a": pa.array(np.concatenate(out_a)),
                    "id_b": pa.array(np.concatenate(out_b)),
                    "dist": pa.array(np.concatenate(out_d)),
                }
            )

    return tasks.map_batches(
        WindowPairs,
        fn_constructor_args=(refs, heads_ref, w),
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    )


# --- D-family completion: distinct set operations ---------------------------
def _tagged_sides(ds_a, col_a: str, ds_b, col_b: str, out: str):
    """Tagged distinct-key union — the shared plan for INTERSECT /
    EXCEPT: per-batch distinct + side flags (combiner), one key-sized
    groupby of (max in_a, max in_b)."""

    def tag(col: str, in_a: int):
        def f(t: pa.Table) -> pa.Table:
            keys = pc.unique(
                t[col].combine_chunks()
                if isinstance(t[col], pa.ChunkedArray)
                else t[col]
            )
            n = len(keys)
            return pa.table(
                {
                    out: pc.cast(keys, pa.int64()),
                    "in_a": pa.array(np.full(n, in_a, np.int64)),
                    "in_b": pa.array(np.full(n, 1 - in_a, np.int64)),
                }
            )

        return f

    a = ds_a.map_batches(tag(col_a, 1), batch_format="pyarrow")
    b = ds_b.map_batches(tag(col_b, 0), batch_format="pyarrow")
    return (
        a.union(b)
        .groupby(out)
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
    )


def intersect_distinct(sf_dir: str):
    """DISTINCT INTERSECT (D family): nations present among BOTH
    customers and suppliers — distinct keys never leave their batch
    untagged, and the only exchange is key-sized."""
    sides = _tagged_sides(
        _read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey",
        _read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey",
        "nationkey",
    )
    return sides.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 1))
        ).select(["nationkey"]),
        batch_format="pyarrow",
    )


def except_distinct(sf_dir: str, price: float = 1500.0):
    """DISTINCT EXCEPT (D family): ordered partkeys that are NOT among
    the expensive parts (p_retailprice >= price).  Same tagged-union
    plan as ``intersect_distinct``, on a high-cardinality key — and a
    non-empty result by construction (an empty Ray Dataset loses its
    schema, which the driver's compare rejects)."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["p_retailprice"], price)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    sides = _tagged_sides(
        _read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey",
        parts, "p_partkey",
        "partkey",
    )
    return sides.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 0))
        ).select(["partkey"]),
        batch_format="pyarrow",
    )


# --- pivot (wide conditional aggregation over a bounded column domain) -----
def pivot_wide(sf_dir: str, types=("click", "error", "purchase", "signup", "view")):
    """events pivoted wide: one ``<type>_sum`` column per event_type,
    summing ``value`` per user (the classic long→wide pivot).

    The pivot column set is BOUNDED AND KNOWN UP FRONT — the only shape
    that exists at 100 TB (an unbounded pivot is a schema explosion; a
    discovery pre-pass would be :func:`distinct_count` on the pivot
    key).  Plan: per batch, each type becomes a masked value column and
    one Arrow ``group_by`` emits ≤ n_users wide partial rows, so the
    shuffle carries |users|×|types| numbers per batch instead of the
    event stream; the global ``groupby`` then sums domain-sized
    partials.  Reference analogue: the two-level grouped counts of A3
    (creator.py:151-171) widened over a fixed category set."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    out_cols = [f"{ty}_sum" for ty in types]

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty, oc in zip(types, out_cols):
            mask = pc.equal(t["event_type"], pa.scalar(ty))
            cols[oc] = pc.if_else(mask, t["value"], pa.scalar(0.0))
        w = pa.table(cols)
        g = w.group_by(["user_id"]).aggregate([(oc, "sum") for oc in out_cols])
        return g.rename_columns(["user_id", *out_cols])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(oc, alias_name=oc) for oc in out_cols])
    )
    return out.map_batches(_round_cols(out_cols), batch_format="pyarrow")


# --- rollup (multi-level grouped aggregate, GROUP BY ROLLUP semantics) -----
def rollup_agg(sf_dir: str):
    """lineitem aggregated at THREE grouping levels in one result —
    ``(l_returnflag, l_linestatus)``, ``(l_returnflag)`` and the grand
    total — with NULLs marking the rolled-up columns, exactly SQL's
    ``GROUP BY ROLLUP``.

    The input is scanned ONCE at the finest level (per-batch Arrow
    combiner → one domain-sized groupby, as :func:`grouped_agg`); the
    coarser levels re-aggregate that finest RESULT — a key-domain-sized
    dataset (|rf|·|ls| rows), never the input — so the rollup costs one
    wide shuffle plus two trivially small ones regardless of row
    count."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
        # three lazy consumers (fine/mid/top) would each re-execute the
        # full input scan; the finest aggregate is key-domain-sized
        # (|rf|·|ls| rows), so materializing it is free and load-bearing
        .materialize()
    )

    def _shape(t: pa.Table, null_ls: bool, null_rf: bool = False) -> pa.Table:
        n = len(t)
        rf = pa.nulls(n, pa.string()) if null_rf else pc.cast(t["l_returnflag"], pa.string())
        ls = pa.nulls(n, pa.string()) if null_ls else pc.cast(t["l_linestatus"], pa.string())
        return pa.table(
            {
                "l_returnflag": rf,
                "l_linestatus": ls,
                "sum_qty": pc.cast(t["sum_qty"], pa.float64()),
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
            }
        )

    mid = (
        fine.groupby("l_returnflag")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
        .map_batches(lambda t: _shape(t, null_ls=True), batch_format="pyarrow")
    )
    top = (
        fine.groupby(None)
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
        .map_batches(
            lambda t: _shape(
                t.append_column("l_returnflag", pa.nulls(len(t), pa.string()))
                .append_column("l_linestatus", pa.nulls(len(t), pa.string())),
                null_ls=True,
                null_rf=True,
            ),
            batch_format="pyarrow",
        )
    )
    fine_s = fine.map_batches(lambda t: _shape(t, null_ls=False), batch_format="pyarrow")
    return fine_s.union(mid, top).map_batches(
        _round_cols(["sum_qty"]), batch_format="pyarrow"
    )


# --- salted join (hot-key mitigation for large-large shuffles) -------------
def skew_join(sf_dir: str, salts: int = 8):
    """lineitem ⋈ supplier → per-nation item count + revenue, executed
    as a SALTED join: the probe side's key is extended with a
    deterministic ``salt = l_orderkey % salts`` and every build row is
    replicated once per salt, so ONE hot supplier key spreads over
    ``salts`` join partitions instead of pinning a single aggregator
    (the standard hot-key mitigation; same idea as the LSH emitter's
    ``salt_limit`` on blocking keys, stages/blocking.py).

    Use when the build side is too big to broadcast (else
    :func:`broadcast_join` wins) AND probe keys are skewed — the cost is
    a ``salts``× replication of the build side, which is why salts stays
    small.  Result is salt-invariant by construction (pinned by
    ``tests/test_ops.py``); the oracle is the plain unsalted SQL join."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_orderkey", "l_extendedprice"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def salt_probe(t: pa.Table) -> pa.Table:
        s = pc.cast(
            pc.subtract(
                t["l_orderkey"],
                pc.multiply(pc.divide(t["l_orderkey"], pa.scalar(salts)), pa.scalar(salts)),
            ),
            pa.int32(),
        )
        return pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "salt": s,
                "l_extendedprice": t["l_extendedprice"],
            }
        )

    def replicate_build(t: pa.Table) -> pa.Table:
        idx = np.repeat(np.arange(len(t), dtype=np.int64), salts)
        rep = t.take(pa.array(idx))
        salt = pa.array(np.tile(np.arange(salts, dtype=np.int32), len(t)))
        return pa.table(
            {
                "s_suppkey": rep["s_suppkey"],
                "s_salt": salt,
                "s_nationkey": rep["s_nationkey"],
            }
        )

    joined = li.map_batches(salt_probe, batch_format="pyarrow").join(
        sup.map_batches(replicate_build, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=auto_join_partitions(None),
        on=("l_suppkey", "salt"),
        right_on=("s_suppkey", "s_salt"),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    out = joined.groupby("s_nationkey").aggregate(
        Count(alias_name="n_items"), Sum("l_extendedprice", alias_name="revenue")
    )
    return out.map_batches(_round_cols(["revenue"]), batch_format="pyarrow")


# --- grouped Pearson correlation (T10 family: exact distributed moments) ---
def grouped_corr(sf_dir: str):
    """Per-key Pearson correlation of quantity vs extended price — the
    bivariate extension of :func:`grouped_stats` (reference telemetry,
    utils/running_averages.py:4-58, generalized to exact distributed
    co-moments).

    Scale shape: each batch emits ONE partial row per key carrying the
    six associative sums (n, Σx, Σy, Σx², Σy², Σxy), so the shuffle is
    key-sized regardless of row count; the correlation is finalized
    after the combine with the SAME float64 expression tree the oracle
    SQL spells out, then rounded to 6 dp on both sides (the partial
    sums of 2-dp prices are not exactly representable, so bit-equality
    of the raw ratio is not guaranteed — the shared rounding is)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_quantity"], pa.float64())
        y = pc.cast(t["l_extendedprice"], pa.float64())
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": x,
                "y": y,
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
                "xy": pc.multiply(x, y),
            }
        )
        g = t2.group_by(["l_returnflag"]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"), ("xy", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["l_returnflag", "sx", "sy", "sxx", "syy", "sxy", "n"])

    combined = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
            Sum("n", alias_name="n_rows"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_rows"], pa.float64())
        mx = pc.divide(t["sx"], n)
        my = pc.divide(t["sy"], n)
        cov = pc.subtract(pc.divide(t["sxy"], n), pc.multiply(mx, my))
        vx = pc.subtract(pc.divide(t["sxx"], n), pc.multiply(mx, mx))
        vy = pc.subtract(pc.divide(t["syy"], n), pc.multiply(my, my))
        denom = pc.sqrt(pc.multiply(vx, vy))
        # constant x or y in a group: DuckDB corr() returns NULL; float
        # division by the zero denominator would give +/-inf/NaN instead
        corr = pc.if_else(
            pc.equal(denom, pa.scalar(0.0)),
            pa.scalar(None, pa.float64()),
            pc.divide(cov, denom),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
                "corr_qty_price": corr,
            }
        )

    return combined.map_batches(finalize, batch_format="pyarrow").map_batches(
        _round_cols(["corr_qty_price"], nd=6), batch_format="pyarrow"
    )


# --- per-key ranking window (row_number + lag, no per-group pandas) --------
def ranked_per_key(sf_dir: str):
    """Per-customer order ranking: ``row_number`` by (totalprice desc,
    orderkey asc) plus ``lag(totalprice)`` within the key — the two
    window primitives the reference's per-group "most_common / previous
    value" idioms reduce to (A4 grouped argmax is rank==1 of exactly
    this ordering).

    Scale shape: the same ONE-bucketed-groupby discipline as
    :func:`_bucketed_head` — every key of a bucket is ranked by a single
    NumPy lexsort and run-detection, so a hot customer is a longer run
    inside one vectorized sort, never a per-group pandas straggler.  The
    shuffle moves each row once (hash on key), like any window over an
    unsorted table must."""
    from .functions.hashing import U64, splitmix64
    from .util import shuffle_partitions

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    num_buckets = shuffle_partitions()

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t["o_custkey"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = splitmix64(col.to_numpy().astype(np.int64).view(U64))
        return t.append_column("bucket", pa.array((h % U64(num_buckets)).astype(np.int32)))

    def rank(group: pa.Table) -> pa.Table:
        keys = group["o_custkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.to_numpy(zero_copy_only=False)
        price = group["o_totalprice"].to_numpy(zero_copy_only=False)
        okey = group["o_orderkey"].to_numpy(zero_copy_only=False)
        o = np.lexsort((okey, -price, codes))
        codes_s, price_s = codes[o], price[o]
        run_start = np.ones(len(codes_s), dtype=bool)
        run_start[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(codes_s)))
        rn = np.arange(len(codes_s)) - np.repeat(starts, lens) + 1
        prev = np.empty_like(price_s)
        prev[1:] = price_s[:-1]
        valid = ~run_start  # first row of each key has no predecessor
        return pa.table(
            {
                "o_custkey": pa.array(codes_s),
                "o_orderkey": pa.array(okey[o]),
                "o_totalprice": pa.array(price_s),
                "rn": pa.array(rn.astype(np.int64)),
                "prev_price": pa.array(
                    np.where(valid, prev, np.nan), mask=~valid
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank, batch_format="pyarrow")
    )


# --- left outer join (null-filled probe-preserving join) -------------------
def left_outer_join(sf_dir: str):
    """Every customer with its order count — customers without orders
    kept (count 0): the probe-preserving ``left_outer`` plan the
    clustering stage uses to attach component labels without dropping
    singleton records (stages/clustering.py:262-268).

    Scale shape: the build side is pre-aggregated to ONE row per key
    before the join (combiner-first, so the exchange carries key-sized
    counts, not raw orders), then a partitioned left-outer hash join;
    null fill is a vectorized coalesce."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    counts = orders.groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
    joined = cust.join(
        counts,
        join_type="left_outer",
        num_partitions=auto_join_partitions(None),
        on=("c_custkey",),
        right_on=("o_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def fill(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.coalesce(t["n_orders"], pa.scalar(0, pa.int64())), pa.int64()
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
                "n_orders": n,
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


# --- grouped mode (modal value per key, deterministic tie-break) ------------
def grouped_mode(sf_dir: str):
    """Most frequent quantity per returnflag (smallest value wins ties)
    — the "pick the canonical representative by count" shape (J8/A4:
    creator.py:179-206 grouped argmax) composed OVER derived counts
    instead of raw rows.

    Scale shape: per-batch Arrow combiner → one (key,value)-domain-sized
    groupby for the counts, then the :func:`_bucketed_head` argmax (one
    bucketed shuffle of the count table, single lexsort per bucket) —
    the raw rows are never re-shuffled and no worker holds more than a
    bucket of the count domain."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate([([], "count_all")])
        g = g.rename_columns(["l_returnflag", "l_quantity", "cnt"])
        return g.set_column(2, "cnt", pc.cast(g["cnt"], pa.int64()))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    top = _bucketed_head(
        counts,
        "l_returnflag",
        [("cnt", False), ("l_quantity", True)],
        1,
        ["l_returnflag", "l_quantity", "cnt"],
    )
    return top.map_batches(
        lambda t: t.rename_columns(["l_returnflag", "mode_qty", "n_occurrences"]),
        batch_format="pyarrow",
    )


# --- ntile window (equi-depth tiling per key) -------------------------------
def ntile_ids(i: np.ndarray, s: np.ndarray, n: int) -> np.ndarray:
    """SQL ``NTILE(n)`` tile id (1-based) for 0-based within-partition
    index ``i`` in a partition of size ``s`` (both vectorized): the
    first ``s mod n`` tiles get one extra row.  Matches DuckDB for every
    partition size including ``s < n`` (then each row is its own tile)."""
    base, rem = s // n, s % n
    cut = rem * (base + 1)
    return (
        np.where(i < cut, i // (base + 1), rem + (i - cut) // np.maximum(base, 1)) + 1
    )


def ntile_per_key(sf_dir: str, n: int = 4):
    """Quantity quartiles within each returnflag — ``NTILE(n)`` over
    (quantity, orderkey, linenumber), aggregated to per-(key, tile)
    counts and sums.  The equi-depth tiling the reference's per-group
    "split into R equal batches" idiom reduces to (the BatcherDataset
    S4 contract, datasets.py:22-101, is NTILE over arrival order).

    Scale shape: same ONE-bucketed-groupby discipline as
    :func:`_bucketed_head` — each bucket tiles ALL its keys with a
    single lexsort + run-detection (a hot key is a longer run, never a
    per-group sort), and the per-(key, tile) aggregate collapses inside
    the bucket, so the stage emits a domain-sized table and the raw
    rows shuffle exactly once."""
    from .functions.hashing import U64, hash_strings64
    from .util import shuffle_partitions

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"]
    )
    num_buckets = shuffle_partitions()

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t["l_returnflag"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash_strings64(col)
        return t.append_column("bucket", pa.array((h % U64(num_buckets)).astype(np.int32)))

    def tile(group: pa.Table) -> pa.Table:
        keys = group["l_returnflag"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy()
        qty = group["l_quantity"].to_numpy(zero_copy_only=False)
        okey = group["l_orderkey"].to_numpy(zero_copy_only=False)
        lno = group["l_linenumber"].to_numpy(zero_copy_only=False)
        o = np.lexsort((lno, okey, qty, codes))
        codes_s, qty_s = codes[o], qty[o]
        run_start = np.ones(len(codes_s), dtype=bool)
        run_start[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(codes_s)))
        i = np.arange(len(codes_s)) - np.repeat(starts, lens)  # 0-based in key
        s = np.repeat(lens, lens).astype(np.int64)
        t_id = ntile_ids(i, s, n)
        part = pa.table(
            {
                "l_returnflag": pa.array(
                    enc.dictionary.take(pa.array(codes_s.astype(np.int64)))
                ),
                "tile": pa.array(t_id.astype(np.int64)),
                "qty": pa.array(qty_s.astype(np.float64)),
            }
        )
        agg = part.group_by(["l_returnflag", "tile"]).aggregate(
            [("qty", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "l_returnflag": agg["l_returnflag"],
                "tile": agg["tile"],
                "n_rows": pc.cast(agg["count_all"], pa.int64()),
                "sum_qty": agg["qty_sum"],
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tile, batch_format="pyarrow")
    )
    return out.map_batches(_round_cols(["sum_qty"]), batch_format="pyarrow")


# --- ordered string aggregation (grouped concat) ----------------------------
def grouped_concat(sf_dir: str):
    """Per nation: the sorted '|'-joined set of its customers' market
    segments — ``string_agg(DISTINCT ... ORDER BY ...)``: the
    "assemble the alias list per entity" shape (creator.py:151-171
    builds exactly this name-list-per-qid string table).

    Scale shape: distinct (nation, segment) pairs are collapsed
    per-batch by an Arrow combiner BEFORE the shuffle, so the exchange
    and the concat stage see a (key x segment-domain)-sized table, not
    raw customers; the per-run join loop therefore iterates over
    domain-sized runs, never over input rows."""
    from .functions.hashing import U64, splitmix64
    from .util import shuffle_partitions

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    num_buckets = shuffle_partitions()

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_nationkey", "c_mktsegment"]).aggregate([])
        key = g["c_nationkey"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        h = splitmix64(key.to_numpy().astype(np.int64).view(U64))
        return g.append_column("bucket", pa.array((h % U64(num_buckets)).astype(np.int32)))

    def concat(group: pa.Table) -> pa.Table:
        # group is pre-deduped per batch, not globally: dedupe again here.
        g = group.group_by(["c_nationkey", "c_mktsegment"]).aggregate([])
        keys = g["c_nationkey"].to_numpy(zero_copy_only=False)
        segs = g["c_mktsegment"].to_numpy(zero_copy_only=False)
        o = np.lexsort((segs, keys))
        keys_s, segs_s = keys[o], segs[o]
        run_start = np.ones(len(keys_s), dtype=bool)
        run_start[1:] = keys_s[1:] != keys_s[:-1]
        starts = np.flatnonzero(run_start)
        ends = np.append(starts[1:], len(keys_s))
        return pa.table(
            {
                "c_nationkey": pa.array(keys_s[run_start].astype(np.int64)),
                "segments": pa.array(
                    ["|".join(segs_s[a:b]) for a, b in zip(starts, ends)]
                ),
                "n_segments": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(concat, batch_format="pyarrow")
    )


# --- per-group z-score standardization (feature scaling) --------------------
def grouped_zscore(sf_dir: str):
    """Standardize extendedprice within each returnflag — the
    per-population feature-scaling step of the scorer's featurize stage
    (M16 L2-normalize, utils/embeddings.py:55-123, is the vector-space
    version of exactly this scalar contract).

    Scale shape: one combiner-first pass reduces the input to a
    DOMAIN-sized (key -> sum, sumsq, n) table; that table is collapsed
    on the driver (3 rows), shipped once via ``ray.put``, and the big
    side streams through a stateless vectorized transform — the raw
    rows are never shuffled, the only exchange is the domain-sized
    stats groupby.  Mean/std use the same float64 expression tree as
    the SQL oracle (ss/n - (s/n)^2, memory: oracle discipline)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_extendedprice"], pa.float64())
        g = (
            pa.table(
                {"l_returnflag": t["l_returnflag"], "s": x, "ss": pc.multiply(x, x)}
            )
            .group_by(["l_returnflag"])
            .aggregate([("s", "sum"), ("ss", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "s": g["s_sum"],
                "ss": g["ss_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()  # domain-sized: one row per returnflag
    )
    n = stats["n"].to_numpy(dtype=np.float64)
    s, ss = stats["s"].to_numpy(), stats["ss"].to_numpy()
    mean = s / n
    std = np.sqrt(ss / n - mean * mean)
    lookup_ref = ray.put((pa.array(stats["l_returnflag"]), mean, std))

    def z(t: pa.Table) -> pa.Table:
        keys, mean_v, std_v = ray.get(lookup_ref)
        idx = pc.index_in(t["l_returnflag"], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        x = pc.cast(t["l_extendedprice"], pa.float64()).to_numpy()
        # DuckDB float division by zero yields NULL, not +/-inf: mask
        # zero-variance groups to null so the hash-exact contract holds
        # even on degenerate (constant) groups
        sd = std_v[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            zv = (x - mean_v[idx]) / sd
        z_col = pc.if_else(
            pa.array(sd == 0.0),
            pa.scalar(None, pa.float64()),
            pa.array(np.where(sd == 0.0, 0.0, zv), pa.float64()),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "l_returnflag": t["l_returnflag"],
                "z": z_col,
            }
        )

    return ds.map_batches(z, batch_format="pyarrow").map_batches(
        _round_cols(["z"], nd=4), batch_format="pyarrow"
    )


# --- full outer join (both-side-preserving keyed merge) ---------------------
def full_outer_join(sf_dir: str):
    """Overdrawn customers FULL OUTER urgent-order counts on custkey —
    both inputs are strict subsets of the key domain, so the join emits
    null-filled rows in BOTH directions: the reconciliation shape the
    reference's setdiff diagnostics (D5, recall_calculator's missed/extra
    sets) generalize to when you also need the payload of the unmatched
    side.

    Scale shape: the build side is pre-aggregated to one row per key
    (combiner-first), then a partitioned ``full_outer`` hash join; the
    coalesce/fill is a vectorized map_batches."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    overdrawn = cust.map_batches(
        lambda t: t.filter(pc.less(t["c_acctbal"], 0.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    urgent = orders.map_batches(
        lambda t: t.select(["o_custkey"]).filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby("o_custkey").aggregate(Count(alias_name="n_urgent"))

    joined = overdrawn.join(
        urgent,
        join_type="full_outer",
        num_partitions=auto_join_partitions(None),
        on=("c_custkey",),
        right_on=("o_custkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def fill(t: pa.Table) -> pa.Table:
        # Ray's full_outer join unifies on/right_on into the left key
        # column, so unmatched right rows already carry c_custkey
        key = pc.cast(t["c_custkey"], pa.int64())
        n = pc.cast(pc.coalesce(t["n_urgent"], pa.scalar(0, pa.int64())), pa.int64())
        return pa.table(
            {
                "custkey": key,
                "acctbal": pc.cast(t["c_acctbal"], pa.float64()),
                "n_urgent": n,
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


# --- grouped entropy (Shannon entropy of a categorical per key) -------------
def grouped_entropy(sf_dir: str):
    """Shannon entropy (base 2) of the event-type distribution per user
    — the distribution-shape statistic next to A5's raw qid distribution
    (data_processors/tokens.py:31-47): one number per key for "how mixed
    is this key's behavior", matching DuckDB's ``entropy()`` aggregate.

    Scale shape: per-batch (key, value) count combiner -> ONE
    domain-sized groupby; entropy folds via the sufficient statistics
    ``H = log2(N) - (sum c*log2 c) / N``, so the second groupby carries
    two floats per (key, value) and the raw events shuffle zero times."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        g = g.rename_columns(["user_id", "event_type", "cnt"])
        return g.set_column(2, "cnt", pc.cast(g["cnt"], pa.int64()))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def suff(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "cnt": t["cnt"],
                "clog": pa.array(c * np.log2(c)),
            }
        )

    per_key = (
        counts.map_batches(suff, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="n"), Sum("clog", alias_name="clog"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        clog = t["clog"].to_numpy(zero_copy_only=False)
        ent = np.log2(n) - clog / n
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ent": pa.array(np.maximum(ent, 0.0)),  # -0.0 from fp cancellation
            }
        )

    return per_key.map_batches(finish, batch_format="pyarrow")
