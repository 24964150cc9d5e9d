"""Cluster job entry point for the flagship linkage pipeline.

Designed for ``ray job submit`` on a real cluster (north rule):

    ray job submit --working-dir . -- \
        python tools/run_linkage_job.py \
            --corpus /data/corpus/files \
            --checkpoint-dir /data/ckpt \
            --output /data/out/clusters \
            [--labeled-pairs /data/labeled_pairs.parquet]

Locally it runs against the synthetic corpus:

    python tools/run_linkage_job.py --sf /root/testdata/sf0.001

Connects to the running cluster (``ray.init(address="auto")``) when
submitted as a job; starts a local session otherwise.  Stage outputs
checkpoint under ``--checkpoint-dir`` (resume = rerun the same
command); final clusters land as partitioned Parquet under
``--output``; the run manifest (stage stats, F1 when labels given) is
printed as one JSON line and written next to the output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", help="path to the sharded corpus parquet dir")
    ap.add_argument("--sf", help="testdata scale dir (generates the synthetic corpus)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--output", default="/tmp/mel_ray_out/clusters")
    ap.add_argument("--labeled-pairs", default=None)
    ap.add_argument(
        "--delta",
        default=None,
        help="parquet dir/file of NEW records to link incrementally against "
        "the base result restored from --checkpoint-dir (daily-ingest mode; "
        "output clusters are identical to a from-scratch run over base+delta)",
    )
    ap.add_argument(
        "--commit-checkpoint",
        default=None,
        help="after an incremental merge, write the MERGED result back as a "
        "new base checkpoint at this dir (the next --delta chains against it)",
    )
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True, logging_level="ERROR")
        except ConnectionError:
            ray.init(
                address="local",
                num_cpus=args.num_cpus or 8,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from mel_ray.config import LinkageConfig
    from mel_ray.pipelines.linkage import (
        load_result_from_checkpoint,
        run_linkage,
        run_linkage_incremental,
        save_result_checkpoint,
    )

    corpus = args.corpus
    labeled = args.labeled_pairs
    if not corpus:
        if not args.sf:
            ap.error("one of --corpus / --sf is required")
        from mel_ray.synth import ensure_corpus

        cdir = ensure_corpus(args.sf)
        corpus = str(cdir / "files")
        labeled = labeled or str(cdir / "labeled_pairs.parquet")

    cfg = LinkageConfig(checkpoint_dir=args.checkpoint_dir)
    t0 = time.time()
    if args.delta:
        if not args.checkpoint_dir:
            ap.error("--delta requires --checkpoint-dir (the base to restore)")
        base = load_result_from_checkpoint(args.checkpoint_dir)
        res = run_linkage_incremental(
            base, args.delta, LinkageConfig()  # incremental merge itself streams
        )
        if args.commit_checkpoint:
            res.stats["committed"] = save_result_checkpoint(res, args.commit_checkpoint)
    else:
        res = run_linkage(corpus, cfg)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    res.clusters.write_parquet(str(out_dir))
    manifest = {
        "corpus": corpus,
        "output": str(out_dir),
        "wall_sec": round(time.time() - t0, 3),
        "rows": res.clusters.count(),
        "stages": res.stats,
    }
    if labeled and Path(labeled).exists():
        from mel_ray.stages.evaluate import linkage_f1

        lp = ray.data.read_parquet(labeled)
        metrics = linkage_f1(lp, res.clusters)
        manifest["linkage_f1"] = metrics.to_dict("records")[0]
    line = json.dumps(manifest)
    (out_dir.parent / "run_manifest.json").write_text(line)
    print(line)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
