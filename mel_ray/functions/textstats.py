"""Text-analysis kernels for the training-data-pipeline operator family:
language ID, quality scoring, token counting, document fingerprinting.

All Arrow-compute / NumPy vectorized; each has a matching DuckDB oracle
SQL in ``__ray_entry__.oracle_sql`` (both sides use RE2 regexes, so the
semantics line up exactly) or a naive-Python test oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import U64, splitmix64, string_array_buffers
from .shingles import char_kgram_hashes

TOKEN_RE = r"[A-Za-z0-9]+"

# BPE-ish pre-tokenizer: GPT-2-style word/number/punct/space runs with
# contraction splitting, restricted to RE2 (no lookahead) so Arrow and
# DuckDB count identically.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Number of BPE-style pre-tokens per row (the tokenizer-budget
    estimate a training-data pipeline bins documents by)."""
    return pc.count_substring_regex(text, BPE_RE)

# Unicode-script heuristics for language ID (RE2 classes, identical in
# DuckDB's regexp functions and Arrow's).
_SCRIPT_RES = [
    ("zh", r"[\p{Han}]"),
    ("ja", r"[\p{Hiragana}\p{Katakana}]"),
    ("ko", r"[\p{Hangul}]"),
    ("ru", r"[\p{Cyrillic}]"),
    ("ar", r"[\p{Arabic}]"),
]
# Latin-script languages: marker stopwords (word-boundary regexes).
_MARKER_RES = [
    ("es", r"(?i)\b(el|la|los|las|una|por|para|con|este)\b"),
    ("de", r"(?i)\b(der|die|das|und|nicht|ein|eine|mit)\b"),
    ("fr", r"(?i)\b(le|les|des|une|est|dans|pour|avec)\b"),
]


def token_count(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Number of ``[A-Za-z0-9]+`` tokens per row (whitespace/punct split)."""
    return pc.count_substring_regex(text, TOKEN_RE)


def quality_stats(text: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Quality-scoring features: lengths, word stats, punct/space/upper ratios."""
    n_chars = pc.utf8_length(text)
    n_words = pc.count_substring_regex(text, TOKEN_RE)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]")
    n_upper = pc.count_substring_regex(text, r"[A-Z]")
    n_digit = pc.count_substring_regex(text, r"[0-9]")
    n_space = pc.count_substring_regex(text, r"[ \t\n]")
    n_punct = pc.count_substring_regex(text, r"[^A-Za-z0-9 \t\n]")
    denom = pc.max_element_wise(n_chars, pa.scalar(1, n_chars.type))
    # round_mode: DuckDB's round() is half-away-from-zero; Arrow defaults to
    # half-to-even.  The ratio columns are small-integer fractions, so exact
    # 5e-5 ties are common — the mode must match the oracle.
    f = lambda x: pc.round(
        pc.divide(pc.cast(x, pa.float64()), pc.cast(denom, pa.float64())),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": f(n_alpha),
        "upper_ratio": f(n_upper),
        "digit_ratio": f(n_digit),
        "space_ratio": f(n_space),
        "punct_ratio": f(n_punct),
    }


def lang_id(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Deterministic heuristic language ID.

    Script detection first (any Han char -> zh, etc., in `_SCRIPT_RES`
    order), then Latin marker-stopword argmax (ties -> earlier entry),
    else "en".  Mirrored 1:1 by a CASE/greatest expression in the oracle
    SQL (both engines run RE2).
    """
    n = len(text)
    out = np.full(n, "", dtype=object)
    decided = np.zeros(n, dtype=bool)
    for code, pat in _SCRIPT_RES:
        hit = pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False) > 0
        sel = hit & ~decided
        out[sel] = code
        decided |= hit
    marker_counts = np.stack(
        [
            pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False)
            for _, pat in _MARKER_RES
        ],
        axis=1,
    )
    best = np.argmax(marker_counts, axis=1)  # first max wins (tie -> earlier)
    best_cnt = marker_counts[np.arange(n), best]
    langs = np.array([code for code, _ in _MARKER_RES], dtype=object)
    sel = ~decided & (best_cnt > 0)
    out[sel] = langs[best[sel]]
    out[~decided & (best_cnt == 0)] = "en"
    return pa.array(out, type=pa.string())


def winnow_fingerprint(
    text: pa.Array | pa.ChunkedArray, k: int = 8, num_mins: int = 4
) -> pa.Array:
    """Winnowing-style rolling-hash document fingerprint.

    Hash all k-byte windows (rolling polynomial, vectorized), keep the
    ``num_mins`` smallest window hashes, fold them into one uint64.
    Robust to content reordering at the edges; deterministic.  The
    reference's polynomial-rolling-hash dedup is the analogue
    (``src/models/data/only_once_dataset.py:60-85``).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    data, offsets = string_array_buffers(text)
    n = len(offsets) - 1
    values, out_off = char_kgram_hashes(data, offsets, k)
    out = np.zeros(n, dtype=U64)
    counts = out_off[1:] - out_off[:-1]
    for i in range(n):  # bounded by num_mins partial sort per row
        seg = values[out_off[i] : out_off[i + 1]]
        if len(seg) == 0:
            out[i] = U64(0)
            continue
        m = min(num_mins, len(seg))
        mins = np.sort(np.partition(seg, m - 1)[:m])
        acc = U64(0xABCDEF)
        with np.errstate(over="ignore"):
            for v in mins:
                acc = splitmix64(np.array([acc ^ v], dtype=U64))[0]
        out[i] = acc
    return pa.array(out.astype(np.uint64))
