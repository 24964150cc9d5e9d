"""Stream-shaped operators over the ``events`` table.

Ray Data is a bounded-stream engine (no watermarks — SURVEY.md §2.9):
event-time windows, sessionization and running aggregates are grouped
computations over per-key ts-sorted groups (``groupby(key).map_groups``
with a vectorized body).  Each has an exact DuckDB window-function
oracle.
"""

from __future__ import annotations

import numpy as np

import ray.data

from .util import read_parquet_clean


def _events(sf_dir: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def _with_user_bucket(ds, num_buckets: int):
    """Add ``bucket = splitmix64(user_id) % B`` so ONE groupby shuffle
    co-locates each user while the group fn processes a whole bucket of
    users with NumPy run-detection (the blocking.py pattern) — per-user
    pandas dispatch and hot-user pandas-sort stragglers both retired."""
    import pyarrow as pa

    from .functions.hashing import U64, splitmix64

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        h = splitmix64(uid.to_numpy().astype(np.int64).view(U64))
        return t.append_column("bucket", pa.array((h % U64(num_buckets)).astype(np.int32)))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def _user_runs(group, order_cols):
    """lexsort a bucket by (user_id, *order_cols) and return the sorted
    row order plus per-user run boundaries (starts, lens)."""
    uid = group["user_id"].to_numpy()
    keys = [group[c].to_numpy() for c in reversed(order_cols)] + [uid]
    order = np.lexsort(tuple(keys))
    uid_s = uid[order]
    run_start = np.ones(len(uid_s), dtype=bool)
    run_start[1:] = uid_s[1:] != uid_s[:-1]
    starts = np.flatnonzero(run_start)
    lens = np.diff(np.append(starts, len(uid_s)))
    return order, starts, lens


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """per user: split the ts-ordered event stream at gaps > ``gap``;
    emit one row per session (user_id, session_id, n_events, t_start).

    session_id = 0-based index of the session within the user's stream;
    the grouped-sorted-scan shape of the reference's per-file ordered
    processing (multifile_dataset.py:22-29) with explicit event-time
    semantics."""
    from .util import shuffle_partitions

    ds = _events(sf_dir, ["user_id", "ts", "event_id"])
    gap = np.timedelta64(gap_minutes, "m")

    def per_bucket(g: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        order, starts, lens = _user_runs(g, ["ts", "event_id"])
        uid = g["user_id"].to_numpy()[order]
        ts = g["ts"].to_numpy()[order]
        # session boundary: first row of a user run OR gap exceeded
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        new_session[starts] = True
        # 0-based session id within each user run: global boundary cumsum
        # minus its value at the run start (exact integer arithmetic)
        c = np.cumsum(new_session)
        sid = c - np.repeat(c[starts], lens)  # first boundary row -> 0? no:
        # c[start] counts the boundary AT the start row, so subtracting it
        # zeroes the first session; later boundaries increment from there.
        s_idx = np.flatnonzero(new_session)  # one session per boundary row
        n_events = np.diff(np.append(s_idx, len(ts)))
        return pa.table(
            {
                "user_id": pa.array(uid[s_idx]),
                "session_id": pa.array(sid[s_idx].astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
                "t_start": pa.array(ts[s_idx]),
            }
        )

    out = (
        _with_user_bucket(ds, shuffle_partitions())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    # pin output dtypes to the oracle's: the pandas path emits
    # datetime64[ns] / platform ints, the parquet source (and DuckDB) use
    # timestamp[us] / int64 — a representation-level hash mismatch otherwise.
    def cast(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        return pa.table(
            {
                "user_id": pa.compute.cast(t["user_id"], pa.int64()),
                "session_id": pa.compute.cast(t["session_id"], pa.int64()),
                "n_events": pa.compute.cast(t["n_events"], pa.int64()),
                "t_start": pa.compute.cast(t["t_start"], pa.timestamp("us")),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def running_sum(sf_dir: str):
    """per user, ts-ordered cumulative sum of ``value`` (rounded) — the
    bounded-stream recast of a stateful running aggregate
    (RunningAverages, utils/running_averages.py:4-58)."""
    from .util import shuffle_partitions

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def per_bucket(g: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        from .util import round_half_away

        order, starts, lens = _user_runs(g, ["ts", "event_id"])
        uid = g["user_id"].to_numpy()[order]
        eid = g["event_id"].to_numpy()[order]
        val = g["value"].to_numpy()[order]
        # per-run cumsum: a tiny Python loop over RUNS with a vectorized
        # body — bitwise-identical to a sequential per-user cumsum (a
        # subtract-the-prefix trick would reassociate the float adds and
        # can flip a value across the 2-dp rounding boundary vs the
        # window-function oracle)
        run = np.empty_like(val)
        for s, n in zip(starts, lens):
            run[s : s + n] = np.cumsum(val[s : s + n])
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "running_value": pa.array(round_half_away(run, 2)),
            }
        )

    return (
        _with_user_bucket(ds, shuffle_partitions())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sliding_window_counts(sf_dir: str, size_minutes: int = 60, slide_minutes: int = 30):
    """sliding event-time windows (size 60m, slide 30m) per event_type:
    each event lands in size/slide windows — the flat-map row expansion
    + grouped count composition."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    ds = _events(sf_dir, ["event_type", "ts"])
    k = size_minutes // slide_minutes

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks() if isinstance(t["ts"], pa.ChunkedArray) else t["ts"]
        tsn = ts.to_numpy().astype("datetime64[us]")
        slide = np.timedelta64(slide_minutes * 60_000_000, "us")
        base = (tsn - np.datetime64(0, "us")) // slide  # slide-bucket index
        types = t["event_type"].to_numpy(zero_copy_only=False)
        starts = []
        etypes = []
        for i in range(k):
            w = (base - i) * slide + np.datetime64(0, "us")
            starts.append(w)
            etypes.append(types)
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(etypes)),
                "window_start": pa.array(np.concatenate(starts)),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"))
    )


def asof_join(sf_dir: str, left_type: str = "purchase", right_type: str = "click"):
    """Event-time AS-OF join (the custom operator Ray Data lacks,
    composed per the partitioning rule: sort-within-key after ONE
    ``groupby(user_id)`` shuffle): every ``left_type`` event joins the
    most recent ``right_type`` event of the same user with
    ``click.ts <= purchase.ts`` (backward as-of, inner).  Same-ts right
    rows are deduplicated to the max event_id so the join is
    deterministic (DuckDB's ASOF leaves equal-key ties unspecified).

    Partitioning assumption (documented per SURVEY §2.9): one user's
    event history fits one group — the same contract as sessionize;
    salting a hot user would need a two-phase merge of per-salt as-of
    results.  Both sides travel through ONE shuffle keyed by user_id
    with a ``side`` flag instead of two separate exchanges."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        is_l = pc.equal(t["event_type"], left_type)
        is_r = pc.equal(t["event_type"], right_type)
        t2 = t.filter(pc.or_(is_l, is_r))
        side = pc.cast(pc.equal(t2["event_type"], left_type), pa.int8())
        return pa.table(
            {
                "event_id": t2["event_id"],
                "ts": t2["ts"],
                "user_id": t2["user_id"],
                "side": side,
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        order, starts, lens = _user_runs(g, [])
        ts_all = g["ts"].to_numpy()[order]
        side_all = g["side"].to_numpy()[order]
        eid_all = g["event_id"].to_numpy()[order]
        uid_all = g["user_id"].to_numpy()[order]
        out_id, out_uid, out_ts, out_cid, out_cts = [], [], [], [], []
        # tiny loop over USER runs with a vectorized body (not per-row,
        # not per-group Ray dispatch)
        for s, n in zip(starts, lens):
            ts = ts_all[s : s + n]
            side = side_all[s : s + n]
            eid = eid_all[s : s + n]
            L = side == 1
            r_ts, r_id = ts[~L], eid[~L]
            l_ts, l_id = ts[L], eid[L]
            ro = np.lexsort((r_id, r_ts))
            r_ts, r_id = r_ts[ro], r_id[ro]
            if len(r_ts):
                # dedupe right rows per ts: keep max event_id (deterministic)
                last = np.ones(len(r_ts), dtype=bool)
                last[:-1] = r_ts[1:] != r_ts[:-1]
                r_ts, r_id = r_ts[last], r_id[last]
            pos = np.searchsorted(r_ts, l_ts, side="right") - 1
            hit = pos >= 0
            l_ts, l_id, pos = l_ts[hit], l_id[hit], pos[hit]
            if not len(l_id):
                continue
            out_id.append(l_id)
            out_uid.append(np.full(len(l_id), uid_all[s], dtype=np.int64))
            out_ts.append(l_ts)
            out_cid.append(r_id[pos])
            out_cts.append(r_ts[pos])
        if not out_id:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "last_click_id": pa.array([], pa.int64()),
                    "last_click_ts": pa.array([], pa.timestamp("us")),
                }
            )
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id)),
                "user_id": pa.array(np.concatenate(out_uid)),
                "ts": pa.array(np.concatenate(out_ts)).cast(pa.timestamp("us")),
                "last_click_id": pa.array(np.concatenate(out_cid)),
                "last_click_ts": pa.array(np.concatenate(out_cts)).cast(
                    pa.timestamp("us")
                ),
            }
        )

    from .util import shuffle_partitions

    return (
        _with_user_bucket(
            ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
            shuffle_partitions(),
        )
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
