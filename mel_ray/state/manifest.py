"""Per-stage checkpointed Parquet outputs + lineage manifests.

Recast of the reference's idempotence contract — the shell loop's
"skip stage if its dir is non-empty"
(``src/scripts/train/all_langs_no_slurm.sh:47-110``) — made atomic and
verifiable: each stage writes to a temp dir, the manifest records the
input fingerprint and per-file (partition) row counts, and the rename
is the commit point.  A rerun with the same input fingerprint streams
the stage back from Parquet instead of recomputing; a torn run (temp
dir present, no manifest) is discarded and recomputed.

Partition-level resume: output files are the stage's partitions; the
manifest lists them individually so an external scheduler can verify /
re-ship any subset.  (SURVEY.md §3.3 "Ray recast of the lifecycle".)
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Callable

import pyarrow.parquet as pq

import ray.data


def _input_fingerprint(paths: list[str]) -> str:
    parts = []
    for p in paths:
        p = Path(p)
        if p.is_file():
            st = p.stat()
            parts.append(f"{p}:{st.st_size}")
        elif p.is_dir():
            for f in sorted(p.rglob("*.parquet")):
                st = f.stat()
                parts.append(f"{f}:{st.st_size}")
        else:
            parts.append(str(p))
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


# bump whenever a stage's on-disk format changes (binary encodings,
# column layout) so stale checkpoints from older code are rebuilt, not
# silently restored with the wrong decode.
FORMAT_VERSION = 2


class StageCheckpointer:
    """``through(name, builder)``: run-or-restore a stage dataset."""

    def __init__(
        self,
        root: str | None,
        fingerprint_inputs: list[str] | None = None,
        config_token: str = "",
    ):
        self.root = Path(root) if root else None
        if root:
            base = _input_fingerprint(fingerprint_inputs or [])
            import hashlib

            self.fingerprint = hashlib.sha256(
                f"{base}|v{FORMAT_VERSION}|{config_token}".encode()
            ).hexdigest()[:16]
        else:
            self.fingerprint = ""
        self.stats: dict[str, Any] = {}

    def through(
        self, name: str, builder: Callable[[], "ray.data.Dataset"]
    ) -> "ray.data.Dataset":
        if self.root is None:
            # No checkpoint dir: stage boundary = object-store materialization
            # (consumed by multiple downstream branches / iterative stages;
            # leaving it lazy would re-execute the whole upstream per branch).
            # With a checkpoint dir the Parquet file is the boundary instead.
            t0 = time.time()
            ds = builder().materialize()
            self.stats[name] = {
                "restored": False,
                "rows": ds.count(),
                "wall_sec": round(time.time() - t0, 3),
            }
            return ds
        stage_dir = self.root / name
        data_dir = stage_dir / "data"
        manifest_path = stage_dir / "manifest.json"
        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            if manifest.get("input_fingerprint") == self.fingerprint:
                self.stats[name] = {"restored": True, "rows": manifest["row_count"]}
                return ray.data.read_parquet(str(data_dir))
            # stale checkpoint for different input: rebuild
            shutil.rmtree(stage_dir, ignore_errors=True)
        tmp = stage_dir / ".tmp-data"
        shutil.rmtree(tmp, ignore_errors=True)
        tmp.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        builder().write_parquet(str(tmp))
        partitions = []
        total = 0
        for f in sorted(tmp.glob("*.parquet")):
            rows = pq.read_metadata(f).num_rows
            partitions.append({"file": f.name, "rows": rows, "done": True})
            total += rows
        os.rename(tmp, data_dir)
        manifest = {
            "stage": name,
            "input_fingerprint": self.fingerprint,
            "row_count": total,
            "partitions": partitions,
            "wall_sec": round(time.time() - t0, 3),
        }
        manifest_path.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        self.stats[name] = {"restored": False, "rows": total, "wall_sec": manifest["wall_sec"]}
        return ray.data.read_parquet(str(data_dir))
