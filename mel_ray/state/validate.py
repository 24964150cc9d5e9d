"""Order-insensitive Parquet-tree equality (multiset fingerprints).

Recast of the reference's offline tokenization validator
(``src/tokenization/validate_tokens.py:18-142`` — sorted-multiset
comparison of two output dirs): instead of sorting both datasets (an
all-to-all shuffle each), every row is reduced to a 64-bit hash of its
canonical encoding and each tree to the fingerprint
``(count, xor(h), sum(h) mod 2^64)``.  Equal multisets give equal
fingerprints; a differing multiset escapes detection only if both the
xor and the sum of splitmix64-mixed hashes collide (~2^-128).  The scan
streams — nothing is sorted, collected, or shuffled, so two 100-TB
checkpoint trees compare with one pass each.

CLI wrapper: ``tools/validate_output.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import U64, hash_strings64, splitmix64

_NULL_SENTINEL = U64(0x9E3779B97F4A7C15)


def _column_hashes(col: pa.ChunkedArray | pa.Array, name: str) -> np.ndarray:
    """Per-row uint64 hash of one column, salted by the column name so
    value swaps across same-typed columns change the row hash."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        h = hash_strings64(col)
    elif pa.types.is_floating(t):
        # hash the float64 BIT PATTERN: exact — a 1-ulp drift is a diff
        vals = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        h = splitmix64(vals.view(np.uint64))
    elif pa.types.is_integer(t) or pa.types.is_boolean(t) or pa.types.is_temporal(t):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = splitmix64(vals.view(np.uint64))
    else:
        # slow fallback for nested types (lists/structs): canonical repr
        h = hash_strings64(pa.array([repr(v.as_py()) for v in col], pa.string()))
    if col.null_count:
        mask = col.is_null().to_numpy(zero_copy_only=False)
        h = h.copy()
        h[mask] = _NULL_SENTINEL
    salt = hash_strings64(pa.array([name], pa.string()))[0]
    return splitmix64(h ^ salt)


def row_hashes(batch: pa.Table, columns: list[str]) -> np.ndarray:
    """Per-row hash: columns combined in sorted name order with a
    chained splitmix64 mix."""
    h = np.zeros(len(batch), dtype=U64)
    for name in columns:
        h = splitmix64(h ^ _column_hashes(batch[name], name))
    return h


def tree_fingerprint(path: str, columns: list[str] | None = None) -> dict:
    """(schema, count, xor, sum) multiset fingerprint of a Parquet tree."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    ds = ray.data.read_parquet(path, columns=columns)
    schema = ds.schema()  # ray.data Schema wrapper: .names / .types
    types = dict(zip(schema.names, [str(t) for t in schema.types]))
    cols = sorted(schema.names)

    def to_fp(batch: pa.Table) -> pa.Table:
        h = row_hashes(batch, cols)
        return pa.table(
            {
                "n": pa.array([len(batch)], pa.int64()),
                "x": pa.array([np.bitwise_xor.reduce(h, initial=0)], pa.uint64()),
                "s": pa.array(
                    [np.add.reduce(h, initial=U64(0), dtype=U64)], pa.uint64()
                ),
            }
        )

    parts = ds.map_batches(to_fp, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    x = np.uint64(0)
    s = np.uint64(0)
    with np.errstate(over="ignore"):
        for p in parts:
            x ^= np.uint64(p["x"])
            s += np.uint64(p["s"])
    return {
        "path": path,
        "schema": {name: types[name] for name in cols},
        "count": int(n),
        "xor": int(x),
        "sum": int(s),
    }


def validate_trees(
    tree_a: str, tree_b: str, columns: list[str] | None = None
) -> dict:
    """Compare two Parquet trees: schema (names + types) and row multiset."""
    fa = tree_fingerprint(tree_a, columns)
    fb = tree_fingerprint(tree_b, columns)
    schema_match = fa["schema"] == fb["schema"]
    count_match = fa["count"] == fb["count"]
    multiset_match = (
        schema_match
        and count_match
        and fa["xor"] == fb["xor"]
        and fa["sum"] == fb["sum"]
    )
    return {
        "a": fa,
        "b": fb,
        "schema_match": schema_match,
        "count_match": count_match,
        "multiset_match": multiset_match,
    }
