"""Source-format operators: JSONL (compressed), CSV/TSV, nested parquet.

Closes the non-Parquet half of SURVEY.md §2.1: the reference ingests
xz/bz2/plain JSONL (``loaders/damuel.py:28-61``), TSV mentions
(``loaders/mewsli.py:15-35``) and a nested struct-of-list-of-struct
document model (``damuel.py:74-116``).  Each query here reads a
deterministically exported copy of the testdata through the matching
source reader, so the DuckDB oracle can read the very same files.

Exports are derived from ``<sf_dir>/*.parquet`` with pure
pyarrow/stdlib (no Ray, no randomness), cached under
``/tmp/mel_ray_sources/<sf>/`` behind a done-marker — the same
self-provisioning convention as the synthetic corpus.
"""

from __future__ import annotations

import bz2
import gzip
import json
import lzma
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from .util import read_parquet_clean

_BASE = Path("/tmp/mel_ray_sources")
_N_SHARDS = 8


def _export_root(sf_dir: str) -> Path:
    return _BASE / Path(sf_dir).name


# --------------------------------------------------------------------------
# deterministic exports (pure Python; cached)
# --------------------------------------------------------------------------


def ensure_jsonl_export(sf_dir: str) -> Path:
    """documents.parquet -> part-%05d.jsonl.gz shards (doc_id % N), plus
    one .xz and one .bz2 shard mirroring the reference's mixed-codec
    directories.  The gz-only subdir is what the SQL oracle reads
    (DuckDB reads gzip JSONL natively; xz/bz2 are covered by the Ray
    reader + pytest)."""
    root = _export_root(sf_dir) / "jsonl"
    done = root / "_DONE"
    if done.exists():
        return root
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    t = t.sort_by("doc_id")
    doc_id = t["doc_id"].to_numpy()
    shard_of = doc_id % _N_SHARDS
    gz_dir = root / "gz"
    mixed_dir = root / "mixed"
    gz_dir.mkdir(parents=True, exist_ok=True)
    mixed_dir.mkdir(parents=True, exist_ok=True)
    langs = t["lang"].to_pylist()
    texts = t["text"].to_pylist()
    for s in range(_N_SHARDS):
        idx = np.flatnonzero(shard_of == s)
        lines = "".join(
            json.dumps(
                {"doc_id": int(doc_id[i]), "lang": langs[i], "text": texts[i]},
                ensure_ascii=False,
            )
            + "\n"
            for i in idx
        ).encode("utf-8")
        (gz_dir / f"part-{s:05d}.jsonl.gz").write_bytes(gzip.compress(lines, mtime=0))
        # mixed-codec mirror: same content, reference-style codec variety
        if s == 0:
            (mixed_dir / f"part-{s:05d}.jsonl.xz").write_bytes(lzma.compress(lines))
        elif s == 1:
            (mixed_dir / f"part-{s:05d}.jsonl.bz2").write_bytes(bz2.compress(lines))
        elif s == 2:
            (mixed_dir / f"part-{s:05d}.jsonl").write_bytes(lines)
        else:
            (mixed_dir / f"part-{s:05d}.jsonl.gz").write_bytes(gzip.compress(lines, mtime=0))
    done.touch()
    return root


def ensure_tsv_export(sf_dir: str) -> Path:
    """events.parquet -> mentions-style TSV shards (the Mewsli TSV shape,
    ``loaders/mewsli.py:15-35``): header + tab-separated rows."""
    root = _export_root(sf_dir) / "tsv"
    done = root / "_DONE"
    if done.exists():
        return root
    root.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "value"]
    ).sort_by("event_id")
    eid = t["event_id"].to_numpy()
    uid = t["user_id"].to_numpy()
    etype = t["event_type"].to_pylist()
    val = t["value"].to_numpy()
    shard_of = eid % _N_SHARDS
    for s in range(_N_SHARDS):
        idx = np.flatnonzero(shard_of == s)
        rows = ["event_id\tuser_id\tevent_type\tvalue"]
        rows += [
            f"{int(eid[i])}\t{int(uid[i])}\t{etype[i]}\t{float(val[i])!r}" for i in idx
        ]
        (root / f"events-{s:05d}.tsv").write_text("\n".join(rows) + "\n")
    done.touch()
    return root


def ensure_nested_export(sf_dir: str) -> Path:
    """Nested document model (struct-of-list-of-struct, the DaMuEL shape
    ``damuel.py:74-116``): one parquet with
    ``links: list<struct<target:int64, weight:double>>`` derived
    arithmetically from doc_id (deterministic, no external data)."""
    root = _export_root(sf_dir) / "nested"
    done = root / "_DONE"
    if done.exists():
        return root
    root.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    t = t.sort_by("doc_id")
    doc_id = t["doc_id"].to_numpy()
    n = len(doc_id)
    n_links = (doc_id % 4).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_links, out=offsets[1:])
    total = int(offsets[-1])
    parent = np.repeat(doc_id, n_links)
    link_i = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), n_links)
    target = (parent * 7 + link_i * 13) % 1000
    weight = ((parent * 31 + link_i * 17) % 1000) / 1000.0
    links = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.StructArray.from_arrays(
            [pa.array(target, pa.int64()), pa.array(weight, pa.float64())],
            names=["target", "weight"],
        ),
    )
    out = pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "title": pc.binary_join_element_wise(
                pa.array(["doc"] * n), pc.cast(pa.array(doc_id), pa.string()), "-"
            ),
            "links": links,
        }
    )
    pq.write_table(out, root / "docs_nested.parquet")
    done.touch()
    return root


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

JSONL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
)


def jsonl_ingest(sf_dir: str):
    """compressed-JSONL source (S1): read the gz shard dir through the
    codec-aware reader, project doc_id/lang + sha256/length of text —
    the canonicalize-at-load shape of the corpus ingest."""
    from .functions.hashing import sha256_hex
    from .sources.jsonl import read_jsonl_dir

    root = ensure_jsonl_export(sf_dir)
    ds = read_jsonl_dir(str(root / "gz"), schema=JSONL_SCHEMA)

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "text_sha": sha256_hex(t["text"]),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def csv_ingest(sf_dir: str):
    """TSV source (S2, the Mewsli mentions shape): read_csv with tab
    delimiter, then a grouped rollup per event_type."""
    from pyarrow import csv as pacsv

    from ray.data.aggregate import Count, Sum

    root = ensure_tsv_export(sf_dir)
    ds = ray.data.read_csv(
        str(root),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        file_extensions=["tsv"],
    )
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n_rows"), Sum("value", alias_name="sum_value")
    )

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_rows": pc.cast(t["n_rows"], pa.int64()),
                "sum_value": pc.round(
                    pc.cast(t["sum_value"], pa.float64()),
                    ndigits=2,
                    round_mode="half_towards_infinity",
                ),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def nested_links(sf_dir: str):
    """nested-column flat_map (M4): explode ``links:
    list<struct<target,weight>>`` into flat rows with zero-copy Arrow
    kernels (list_parent_indices + flatten + struct field) — proves the
    struct/list path flows through map_batches."""
    root = ensure_nested_export(sf_dir)
    ds = read_parquet_clean(str(root / "docs_nested.parquet"), columns=["doc_id", "links"])

    def explode(t: pa.Table) -> pa.Table:
        links = t["links"]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        parent = pc.list_parent_indices(links)
        flat = pc.list_flatten(links)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], parent),
                "target": pc.struct_field(flat, "target"),
                "weight": pc.struct_field(flat, "weight"),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
