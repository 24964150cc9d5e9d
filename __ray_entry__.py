"""Driver contract for the graft builder (Ray Data target).

Thin delegation to :mod:`mel_ray.entrypoints`.  Ray is initialised by
the driver BEFORE this module is imported; nothing here (or in the
library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from mel_ray import entrypoints as _ep


def entry() -> Any:
    """Flagship record-linkage pipeline on the sf0.001-scale corpus."""
    return _ep.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    return _ep.oracle_sql()
