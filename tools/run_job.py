"""Run a config-file-declared job (the run_action_gin CLI analogue).

Usage:
    python tools/run_job.py configs/linkage.yaml [--output /tmp/out]

The config file declares everything (see mel_ray/jobs.py and
configs/linkage.yaml); ``--output`` overrides the file's output dir.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    overrides = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from mel_ray.jobs import load_job, run_job

    spec = load_job(args[0])
    spec.update(overrides)
    out = run_job(spec)
    if "clusters" in out:
        print(f"clusters: {out['clusters'].count()} rows; stats: {out['stats']}")
    elif "dataset" in out and not spec.get("output"):
        print(f"rows: {out['dataset'].count()}")
    ray.shutdown()


if __name__ == "__main__":
    main()
