"""Stream-shaped operators over the ``events`` table.

Ray Data is a bounded-stream engine (no watermarks — SURVEY.md §2.9):
event-time windows, sessionization and running aggregates are grouped
computations over per-key ts-sorted groups (``groupby(key).map_groups``
with a vectorized body).  Each has an exact DuckDB window-function
oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .util import read_parquet_clean


def _events(sf_dir: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """per user: split the ts-ordered event stream at gaps > ``gap``;
    emit one row per session (user_id, session_id, n_events, t_start).

    session_id = 0-based index of the session within the user's stream;
    the grouped-sorted-scan shape of the reference's per-file ordered
    processing (multifile_dataset.py:22-29) with explicit event-time
    semantics."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id"])
    gap = np.timedelta64(gap_minutes, "m")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame({"session_id": sid, "ts": g["ts"].to_numpy()})
            .groupby("session_id")
            .agg(n_events=("ts", "size"), t_start=("ts", "min"))
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

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
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        from .util import round_half_away

        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "running_value": round_half_away(np.cumsum(g["value"].to_numpy()), 2),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy()
        side = g["side"].to_numpy()
        eid = g["event_id"].to_numpy()
        L = side == 1
        r_ts, r_id = ts[~L], eid[~L]
        l_ts, l_id = ts[L], eid[L]
        # dedupe right rows per ts: keep max event_id (deterministic)
        order = np.lexsort((r_id, r_ts))
        r_ts, r_id = r_ts[order], r_id[order]
        if len(r_ts):
            last = np.ones(len(r_ts), dtype=bool)
            last[:-1] = r_ts[1:] != r_ts[:-1]
            r_ts, r_id = r_ts[last], r_id[last]
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        hit = pos >= 0
        l_ts, l_id, pos = l_ts[hit], l_id[hit], pos[hit]
        uid = np.full(len(l_id), g["user_id"][0].as_py(), dtype=np.int64)
        return pa.table(
            {
                "event_id": pa.array(l_id),
                "user_id": pa.array(uid),
                "ts": pa.array(l_ts).cast(pa.timestamp("us")),
                "last_click_id": pa.array(r_id[pos] if len(pos) else np.empty(0, np.int64)),
                "last_click_ts": pa.array(
                    r_ts[pos] if len(pos) else np.empty(0, "datetime64[us]")
                ).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )
