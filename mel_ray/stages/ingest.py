"""Ingest stage: canonicalize once, verify everywhere.

Recast of the reference's loader-level canonicalization — the QID remap
applied at every load (``src/utils/qids_remap.py:35-55`` via the
decorator at ``src/utils/loaders.py:37``) becomes the repo-rename
broadcast map; the per-row ``sha256(content)`` is the invariant the
north rule checks against the reference corpus (BASELINE.json
``input_hint``).

``record_id`` is a deterministic 63-bit fingerprint of
``(repo, path, commit)`` — order-free, so ids are stable under any
block/task scheduling (SURVEY.md §4 "Determinism vs parallelism"). At
10^12-file scale a 128-bit id would be used instead; the kernel is the
same.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import read_parquet_clean

from ..functions.hashing import hash_pairs64, hash_strings64, sha256_hex

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def record_fingerprint(
    repo: pa.Array | pa.ChunkedArray,
    path: pa.Array | pa.ChunkedArray,
    commit: pa.Array | pa.ChunkedArray,
) -> np.ndarray:
    """int64 (positive) deterministic record id."""
    h = hash_pairs64(hash_pairs64(hash_strings64(repo), hash_strings64(path)), hash_strings64(commit))
    return (h >> np.uint64(1)).astype(np.int64)


def remap_column(arr: pa.Array | pa.ChunkedArray, renames: dict[str, str]) -> pa.Array:
    """Vectorized dict-lookup remap of a string column (reference:
    dense-array remap, qids_remap.py:35-55); small map -> index_in +
    take, unmapped values pass through."""
    keys = pa.array(list(renames.keys()), pa.string())
    vals = pa.array(list(renames.values()), pa.string())
    idx = pc.index_in(arr, value_set=keys)
    out = pc.if_else(pc.is_valid(idx), pc.take(vals, idx), arr)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def ingest_batch(batch: pa.Table, renames: dict[str, str] | None = None) -> pa.Table:
    """Arrow-in/Arrow-out: add record_id, sha256, content_len; apply the
    repo-rename canonicalization map (broadcast small side)."""
    if renames:
        batch = batch.set_column(
            batch.schema.get_field_index("repo"),
            "repo",
            remap_column(batch["repo"], renames),
        )
    rid = record_fingerprint(batch["repo"], batch["path"], batch["commit"])
    sha = sha256_hex(batch["content"])
    clen = pc.binary_length(pc.cast(batch["content"], pa.binary()))
    return (
        batch.append_column("record_id", pa.array(rid))
        .append_column("sha256", sha)
        .append_column("content_len", pc.cast(clen, pa.int64()))
    )


def read_corpus(
    corpus_path: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Pruned parquet read of the input table (SURVEY.md §2.1 S1).

    ``override_num_blocks`` sizes the scan's output blocks so fused
    downstream maps emit shuffle-ready block counts (~2 blocks/CPU) —
    otherwise the scan splits into hundreds of fragments and every
    groupby needs a repartition (= an extra AllToAll barrier) first."""
    return read_parquet_clean(
        corpus_path,
        columns=columns or CORPUS_COLUMNS,
        override_num_blocks=override_num_blocks,
    )


def ingest(ds: "ray.data.Dataset", renames: dict[str, str] | None = None) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: ingest_batch(b, renames), batch_format="pyarrow", zero_copy_batch=True
    )
