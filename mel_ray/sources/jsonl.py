"""JSONL source with per-file codec detection (plain / .gz / .bz2 / .xz).

Recast of the reference's primary ingest, ``DaMuELStartLoader``
(``src/tokenization/pipeline/loaders/damuel.py:28-61``): list ``part-*``
files in a directory, open through lzma/bz2/plain per extension, parse
one JSON object per line.  Here the FILE is the unit of parallelism —
``read_binary_files`` hands each shard to a task, which decompresses
with the stdlib codec and parses with Arrow's C++ JSON reader.  Arrow's
native ``read_json`` handles gzip transparently but not xz/bz2, hence
this wrapper; pass an explicit schema so blocks agree across files.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma

import pyarrow as pa
import pyarrow.json as pj

import ray.data

def _decompress_auto(raw: bytes) -> bytes:
    """Codec by MAGIC BYTES, not extension: ``read_binary_files`` may
    already have transparently decompressed known extensions (.gz), so
    sniffing the content is the only robust dispatch."""
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    if raw[:3] == b"BZh":
        return bz2.decompress(raw)
    if raw[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(raw)
    return raw


def read_jsonl_dir(path: str, schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Directory (or glob) of JSONL shards -> Dataset, one parse task per
    file, codec sniffed per file (plain when unrecognized)."""
    files = ray.data.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        opts = pj.ParseOptions(explicit_schema=schema) if schema is not None else None
        tables = []
        for i in range(len(batch)):
            raw = batch["bytes"][i].as_py()
            tables.append(
                pj.read_json(io.BytesIO(_decompress_auto(raw)), parse_options=opts)
            )
        out = pa.concat_tables(tables)
        return out.combine_chunks()

    return files.map_batches(parse, batch_size=1, batch_format="pyarrow")
