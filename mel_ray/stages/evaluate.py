"""Evaluation stage: pairwise linkage F1 on labeled pairs at shared
blocking keys.

Recast of the reference's ``RecallCalculator``
(``src/models/recall_calculator.py:43-66``): where the reference asks
"is the gold QID among the retrieved candidates", we ask "does the
predicted clustering agree with the gold entity on each labeled pair
that shares a blocking key" and report precision / recall / F1
(BASELINE.json metric: F1 >= 0.99).

Distributed: two hash joins attach each side's predicted cluster id,
confusion counts come from a streaming aggregate — nothing large ever
reaches the driver.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def linkage_f1(
    labeled_pairs: "ray.data.Dataset",
    cluster_labels: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """-> one-row DataFrame: tp/fp/fn/tn, precision, recall, f1."""
    from ..util import auto_join_partitions

    num_partitions = auto_join_partitions(num_partitions)
    la = cluster_labels.map_batches(
        lambda t: t.select(["record_id", "cluster_id"]).rename_columns(["id_a", "cluster_a"]),
        batch_format="pyarrow",
    )
    lb = cluster_labels.map_batches(
        lambda t: t.select(["record_id", "cluster_id"]).rename_columns(["id_b", "cluster_b"]),
        batch_format="pyarrow",
    )
    from .scoring import JOIN_AGG_ARGS

    j = labeled_pairs.join(
        la,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    ).materialize()
    j = j.join(
        lb,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )

    def confusion(batch: pa.Table) -> pa.Table:
        import numpy as np

        pred = batch["cluster_a"].to_numpy() == batch["cluster_b"].to_numpy()
        gold = batch["is_match"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tp": pa.array([int((pred & gold).sum())]),
                "fp": pa.array([int((pred & ~gold).sum())]),
                "fn": pa.array([int((~pred & gold).sum())]),
                "tn": pa.array([int((~pred & ~gold).sum())]),
            }
        )

    agg = (
        j.map_batches(confusion, batch_format="pyarrow")
        .aggregate(Sum("tp"), Sum("fp"), Sum("fn"), Sum("tn"))
    )
    tp, fp, fn, tn = (agg[f"sum({k})"] or 0 for k in ("tp", "fp", "fn", "tn"))
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return pd.DataFrame(
        [
            {
                "tp": tp,
                "fp": fp,
                "fn": fn,
                "tn": tn,
                "precision": round(precision, 6),
                "recall": round(recall, 6),
                "f1": round(f1, 6),
            }
        ]
    )
