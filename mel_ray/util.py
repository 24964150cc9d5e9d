"""Small runtime helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x: "np.ndarray", nd: int) -> "np.ndarray":
    """Round half away from zero (DuckDB ``round()`` semantics).

    ``np.round`` is half-to-even, which diverges from the SQL oracle on
    exact ties — use this for any float column that is hash-compared.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**nd
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs of the (already initialised) Ray cluster; never inits Ray."""
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default))


def auto_join_partitions(requested: int | None, rows: int | None = None) -> int:
    """Hash-join partition count that cannot starve a small node: the
    aggregator actors of one join stay under ~half the CPUs.  When the
    (materialized) small side's ``rows`` is known, cap partitions so
    tiny joins don't pay 16 aggregator actors for 25 rows."""
    if requested is not None:
        return requested
    cap = max(2, cluster_cpus() // 2)
    if rows is not None:
        cap = min(cap, max(2, rows // 10_000 + 1))
    return cap


def auto_pool_size(requested: int | None) -> int:
    """Actor-pool size leaving CPU room for the feeding/consuming stages."""
    if requested is not None:
        return requested
    return max(2, cluster_cpus() // 4)
