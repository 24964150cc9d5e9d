"""Shingling kernels: content -> uint64 shingle-hash sets, vectorized.

Analogue of the reference's tokenization stage (the universal
intermediate ``tokens[N,64]`` — SURVEY.md §1.1-3; producers at
``src/tokenization/pipeline/tokenizers/simple.py:6-15``): instead of HF
subword ids we emit hashed shingles that feed MinHash-LSH blocking.

Two shingle families:

* **line shingles** — one hash per whitespace-normalized non-empty line
  (robust to indent/trailing-whitespace edits in code);
* **char k-grams** — sliding k-byte window hashes (used by the char
  n-gram embedder and the winnowing fingerprint).

Both are computed per Arrow batch with NumPy over the raw UTF-8 value
buffer; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import U64, splitmix64, splitmix64_inplace, string_array_buffers, substring_hasher

_NORM_LEAD = r"(?m)^[ \t]+"
_NORM_TRAIL = r"(?m)[ \t]+$"


def normalize_lines(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip per-line leading/trailing whitespace (RE2 via Arrow, C++)."""
    out = pc.replace_substring_regex(arr, pattern=_NORM_LEAD, replacement="")
    out = pc.replace_substring_regex(out, pattern=_NORM_TRAIL, replacement="")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def line_shingles(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Hash every normalized non-empty line of every row.

    Returns ``(values:uint64[M], row_offsets:int64[N+1])`` — a ragged
    array: row i's shingles are ``values[row_offsets[i]:row_offsets[i+1]]``.
    """
    norm = normalize_lines(arr)
    data, offsets = string_array_buffers(norm)
    n_rows = len(offsets) - 1

    # Line boundaries = newline positions plus each row's start/end.
    nl = np.flatnonzero(data == 0x0A)  # b"\n"
    # candidate span edges per row: row_start, newlines inside, row_end
    # Build global sorted edge list: offsets (row starts+ends) and newline positions.
    starts = np.concatenate([offsets[:-1], nl + 1])
    ends = np.concatenate([nl, offsets[1:]])
    starts.sort(kind="stable")
    ends.sort(kind="stable")
    # Now starts[k]:ends[k] are consecutive line spans across the whole buffer
    # (each newline terminates one span and starts the next; row boundaries
    # likewise).  Drop empty spans.
    keep = ends > starts
    starts, ends = starts[keep], ends[keep]

    hasher = substring_hasher(data)
    values = hasher(starts, ends)

    # Assign each span to its row: spans are in buffer order, rows partition
    # the buffer by offsets.
    row_of = np.searchsorted(offsets[1:], starts, side="right")
    counts = np.bincount(row_of, minlength=n_rows)
    row_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_offsets[1:])
    return values, row_offsets


def char_kgram_hashes(
    data: np.ndarray, row_offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sliding k-byte-window hashes over each row's bytes.

    ``data``/``row_offsets`` as from :func:`string_array_buffers`.
    Returns ``(values:uint64[M], out_offsets:int64[N+1])``; rows shorter
    than ``k`` contribute a single whole-row hash.

    For ``k <= 8`` a gram fits one little-endian uint64 word, so the
    hash is a direct window load + splitmix64 — ~10x cheaper than the
    general polynomial-prefix path (which needs two length-N power
    tables and four gathers per gram).  The featurize hot path (embed
    k-grams, k=4) always takes the fast branch.
    """
    n_rows = len(row_offsets) - 1
    lens = row_offsets[1:] - row_offsets[:-1]
    n_grams = np.maximum(lens - k + 1, np.minimum(lens, 1)).astype(np.int64)

    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_grams, out=out_offsets[1:])
    total = int(out_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), out_offsets
    if 1 <= k <= 8:
        return _kgram_hashes_word(data, row_offsets, lens, n_grams, out_offsets, k)

    hasher = substring_hasher(data)
    # Global start index of every k-gram: for each row, row_start + arange(n_grams).
    starts = np.repeat(row_offsets[:-1], n_grams) + (
        np.arange(total) - np.repeat(out_offsets[:-1], n_grams)
    )
    gram_len = np.repeat(np.minimum(lens, k), n_grams)
    values = hasher(starts, starts + gram_len)
    return values, out_offsets


def _kgram_hashes_word(
    data: np.ndarray,
    row_offsets: np.ndarray,
    lens: np.ndarray,
    n_grams: np.ndarray,
    out_offsets: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """k<=8 fast path: gram bytes packed little-endian into uint64,
    XORed with a per-gram-length salt (so a short row's whole-row gram
    cannot collide with a k-gram sharing a zero-padded prefix), then
    splitmix64.

    The window load is an UNALIGNED uint64 view over the byte buffer
    (stride 1 byte): ``wv[i]`` reads bytes ``i..i+7`` directly, so each
    gram costs ONE 8-byte gather + mask instead of a k-pass shift-OR
    window build — the previous build moved ~100 B of temporary traffic
    per content byte, which made featurize DRAM-bound and capped its
    8->32-CPU scaling at 1.55x on a shared-bandwidth host."""
    total = int(out_offsets[-1])
    len_salt = splitmix64(np.arange(k + 1, dtype=U64) + U64(0xA11CE))
    pad = np.zeros(len(data) + 8, dtype=np.uint8)
    pad[: len(data)] = data  # one compact copy; 8-byte zero tail
    wv = np.ndarray(shape=(len(data) + 1,), dtype="<u8", buffer=pad, strides=(1,))
    mask = U64((1 << (8 * k)) - 1) if k < 8 else U64(0xFFFFFFFFFFFFFFFF)

    long_rows = lens >= k
    if long_rows.all():
        # row-major gram order == output order: gather, no scatter
        local = np.arange(total) - np.repeat(out_offsets[:-1], n_grams)
        gidx = np.repeat(row_offsets[:-1], n_grams)
        gidx += local
        vals = wv[gidx]
        vals &= mask
        vals ^= len_salt[k]
        splitmix64_inplace(vals)
        return vals, out_offsets

    values = np.empty(total, dtype=U64)
    if long_rows.any():
        cnt = n_grams[long_rows]
        ccs = np.zeros(len(cnt) + 1, dtype=np.int64)
        np.cumsum(cnt, out=ccs[1:])
        local = np.arange(ccs[-1]) - np.repeat(ccs[:-1], cnt)
        gidx = np.repeat(row_offsets[:-1][long_rows], cnt) + local
        out_idx = np.repeat(out_offsets[:-1][long_rows], cnt) + local
        v = wv[gidx]
        v &= mask
        v ^= len_salt[k]
        splitmix64_inplace(v)
        values[out_idx] = v

    short_rows = (lens < k) & (lens > 0)
    if short_rows.any():
        sl = lens[short_rows].astype(U64)
        so = row_offsets[:-1][short_rows]
        smask = (U64(1) << (U64(8) * sl)) - U64(1)  # sl <= 7 < 8: no overflow
        sval = wv[so]
        sval &= smask
        sval ^= len_salt[sl]
        splitmix64_inplace(sval)
        values[out_offsets[:-1][short_rows]] = sval
    return values, out_offsets


def word_ngram_hashes(
    arr: pa.Array | pa.ChunkedArray, n: int = 3, lowercase: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word n-grams per row (for n-gram-Jaccard dedup on text).

    Words = ``[A-Za-z0-9]+`` runs (RE2 extraction in Arrow); each word is
    hashed, n-grams are rolling combines of n consecutive word hashes.
    Returns ragged ``(values:uint64[M], row_offsets:int64[N+1])``; rows
    with fewer than ``n`` words contribute one n-gram over what they have
    (or none if empty).
    """
    if lowercase:
        arr = pc.utf8_lower(arr)
    lists = pc.split_pattern_regex(
        pc.replace_substring_regex(arr, pattern=r"[^A-Za-z0-9]+", replacement=" "),
        pattern=" ",
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    list_offsets = np.frombuffer(lists.buffers()[1], dtype=np.int32)[
        lists.offset : lists.offset + len(lists) + 1
    ].astype(np.int64)
    word_hashes = _hash_nonempty(flat)
    # drop empty words ("" artifacts of split) while tracking row offsets
    _, woff = string_array_buffers(flat)
    nonempty = (woff[1:] - woff[:-1]) > 0
    row_of = np.searchsorted(list_offsets[1:], np.arange(len(flat)), side="right")
    row_of = row_of[nonempty]
    word_hashes = word_hashes[nonempty]
    n_rows = len(lists)
    counts = np.bincount(row_of, minlength=n_rows)
    word_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=word_offsets[1:])

    # rolling n-gram combine
    if n <= 1:
        return word_hashes, word_offsets
    m = len(word_hashes)
    out_counts = np.maximum(counts - n + 1, np.minimum(counts, 1))
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    total = int(out_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), out_offsets
    gstart = np.repeat(word_offsets[:-1], out_counts) + (
        np.arange(total) - np.repeat(out_offsets[:-1], out_counts)
    )
    glen = np.repeat(np.minimum(counts, n), out_counts)
    acc = np.zeros(total, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(int(glen.max())):
            take = j < glen
            acc[take] = splitmix64(acc[take] ^ word_hashes[gstart[take] + j])
    return acc, out_offsets


def _hash_nonempty(flat: pa.Array) -> np.ndarray:
    data, offsets = string_array_buffers(flat)
    hasher = substring_hasher(data)
    return hasher(offsets[:-1], offsets[1:])
