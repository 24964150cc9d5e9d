"""Config-file-driven job composition (the gin + Fire surface).

The reference wires its pipelines from a gin config plus an action name
(``src/run_action_gin.py:104-119``: ``choose_action(action)`` + the
gin-bound kwargs); this module is the Ray-native analogue: a YAML file
declares the job kind, the input, dataclass config overrides, and —
for generic dataflow jobs — a chain of registry stages
(stages/registry.py, the PipelineStep analogue).

Two job kinds:

* ``kind: linkage`` — the flagship pipeline (pipelines/linkage.py),
  with nested ``config:`` overrides applied onto the LinkageConfig
  dataclass tree (unknown keys are an error, like gin's bind checking).
* ``kind: stages`` — a generic chain: ``read:`` (parquet path) folded
  through ``stages: [name, ...]`` from the stage registry.

Run with ``tools/run_job.py <config.yaml>`` (Fire-analogue CLI).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import ray.data

from .config import LinkageConfig


def _apply_overrides(obj: Any, overrides: dict[str, Any], path: str = "") -> Any:
    """Recursively apply a nested dict onto a frozen dataclass tree;
    unknown keys raise (gin bind-checking semantics)."""
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"{path or 'config'}: {type(obj).__name__} is not configurable")
    fields = {f.name: f for f in dataclasses.fields(obj)}
    kwargs = {}
    for key, val in overrides.items():
        if key not in fields:
            raise KeyError(
                f"unknown config key {path + key!r}; valid: {sorted(fields)}"
            )
        cur = getattr(obj, key)
        if isinstance(val, dict) and dataclasses.is_dataclass(cur):
            kwargs[key] = _apply_overrides(cur, val, path=f"{path}{key}.")
        else:
            kwargs[key] = val
    return dataclasses.replace(obj, **kwargs)


def load_job(path: str | Path) -> dict[str, Any]:
    """Parse + validate a job config file (YAML)."""
    import yaml

    spec = yaml.safe_load(Path(path).read_text())
    if not isinstance(spec, dict) or "kind" not in spec:
        raise ValueError(f"{path}: job config must be a mapping with a 'kind' key")
    kind = spec["kind"]
    if kind == "linkage":
        if "input" not in spec:
            raise ValueError(f"{path}: linkage job needs 'input'")
        spec["config"] = _apply_overrides(LinkageConfig(), spec.get("config") or {})
    elif kind == "stages":
        from .stages.registry import get_stage

        if "read" not in spec or "stages" not in spec:
            raise ValueError(f"{path}: stages job needs 'read' and 'stages'")
        for name in spec["stages"]:
            get_stage(name)  # fail fast on unknown stage names
        spec["config"] = _apply_overrides(LinkageConfig(), spec.get("config") or {})
    else:
        raise ValueError(f"{path}: unknown job kind {kind!r} (linkage | stages)")
    return spec


def run_job(spec: dict[str, Any]) -> dict[str, Any]:
    """Execute a loaded job spec; returns result handles + stats.

    Output (when ``output:`` is set) is partitioned parquet via the
    existing checkpoint-style writer path — resumable, never one file.
    """
    kind = spec["kind"]
    if kind == "linkage":
        from .pipelines.linkage import run_linkage

        res = run_linkage(spec["input"], cfg=spec["config"], renames=spec.get("renames"))
        out: dict[str, Any] = {"clusters": res.clusters, "stats": res.stats}
        if spec.get("output"):
            res.clusters.write_parquet(spec["output"])
        return out
    # kind == "stages"
    from .stages.registry import run_stages
    from .util import read_parquet_clean

    ds = read_parquet_clean(spec["read"], columns=spec.get("columns"))
    ds = run_stages(spec["stages"], ds, spec["config"])
    if spec.get("output"):
        ds.write_parquet(spec["output"])
    return {"dataset": ds}
