"""Shared accounting sink for streaming stages (no-silent-caps without a
materialization barrier).

The blocking stage's band accounting (dropped / salted / capped groups)
originally rode the pair dataset as sentinel rows, which forced the pair
stage to MATERIALIZE so a second consumer could sum them (round-4
layout: pipelines/linkage.py + blocking.extract_band_stats).  When the
pipeline streams pairs straight into the scorer, the counts are instead
recorded in this tiny detached-scope-free actor, KEYED BY BUCKET so
task retries / speculative re-execution overwrite rather than
double-count (per-bucket values are deterministic).  Producers
``ray.get`` their put so a finished producer task implies a recorded
entry; reading totals after the consuming stage materializes is
therefore race-free.

This is the raw-actor escape hatch the Dataset API genuinely cannot
express (a side-channel aggregate over a stage consumed exactly once) —
cf. the reference's StatisticsLogger side channel
(``src/utils/statistics_logger.py``), which logs out-of-band of the
dataflow for the same reason.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class StatsSink:
    """Idempotent keyed counter store: (stage, key) -> counts dict."""

    def __init__(self):
        self._entries: dict[tuple[str, int], dict] = {}

    def put(self, stage: str, key: int, counts: dict) -> None:
        self._entries[(stage, key)] = counts

    def totals(self, stage: str) -> dict:
        out: dict[str, int] = {}
        for (s, _), counts in self._entries.items():
            if s == stage:
                for name, v in counts.items():
                    out[name] = out.get(name, 0) + int(v)
        return out


def new_stats_sink() -> "ray.actor.ActorHandle":
    """A fresh sink actor (session-scoped; dies with the driver)."""
    return StatsSink.remote()
