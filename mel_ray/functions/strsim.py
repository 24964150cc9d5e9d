"""Batch string-similarity kernels: Levenshtein ratio & Jaro-Winkler.

The reference scores candidates only by embedding dot product
(``src/models/searchers/brute_force_searcher.py:28-36``); the north rule
adds Jaro-Winkler / Levenshtein string similarity on ``path`` and
``repo``.  rapidfuzz is not available in this environment, so both are
implemented here:

* ``levenshtein_ratio`` — a *pair-batch-vectorized* DP: the classic
  O(m*n) recurrence iterated over character positions with NumPy over
  the whole pair batch at once (thousands of pairs advance per NumPy
  op).  Strings are truncated to ``max_len`` (paths/repo names are
  short).
* ``jaro_winkler`` — vectorized over the pair batch per character
  position (match-window flagging with NumPy boolean ops).

Both kernels apply two *exact* (bit-identical) cost cuts on top of the
byte-equal skip:

* Levenshtein strips the common prefix and suffix per pair before the
  DP — edit operations never touch them, so ``dist(xa·s, xb·s) ==
  dist(a, b)`` — which collapses fork/near-dup paths that differ in one
  segment to a tiny DP.
* Both kernels then *length-bucket* the surviving pairs (<=8, <=16,
  <=32, ...) and run each bucket at its own matrix width, so one long
  outlier pair no longer widens the whole batch's O(p*m*n) sweep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import string_array_buffers


def _pad_matrix(arr: pa.Array | pa.ChunkedArray, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(P, w) uint8 char matrix (0-padded) + lengths, zero-copy-ish.

    ``w = min(max_len, longest string in the batch)`` — every kernel
    below reads only columns ``< len``, so the tight width is
    output-identical and keeps the boolean/int16 sweeps narrow."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, offsets = string_array_buffers(arr)
    lens = np.minimum(offsets[1:] - offsets[:-1], max_len).astype(np.int64)
    p = len(lens)
    out = np.zeros((p, max(int(lens.max(initial=0)), 1)), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row = np.repeat(np.arange(p), lens)
        col = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        src = np.repeat(offsets[:-1], lens) + col
        out[row, col] = data[src]
    return out, lens


def _equal_mask(a, b) -> np.ndarray:
    """Byte-equality per pair (vectorized Arrow compare).  Candidate
    pairs in this engine are dominated by forks/copies whose path and
    repo strings are IDENTICAL (~56% measured at sf0.01), and both
    similarity kernels are exactly 1.0 on equal strings — so equal
    pairs skip the O(len^2) DP / match-window work entirely."""
    import pyarrow.compute as pc

    eq = pc.equal(a, b)
    if isinstance(eq, pa.ChunkedArray):
        eq = eq.combine_chunks()
    return pc.fill_null(eq, False).to_numpy(zero_copy_only=False)


def _subset(arr, idx: np.ndarray):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.take(pa.array(idx))


def levenshtein_ratio(
    a: pa.Array | pa.ChunkedArray, b: pa.Array | pa.ChunkedArray, max_len: int = 128
) -> np.ndarray:
    """1 - dist/max(len) for each pair, float32 in [0, 1]."""
    eq = _equal_mask(a, b)
    out = np.ones(len(eq), dtype=np.float32)
    todo = np.flatnonzero(~eq)
    if len(todo):
        out[todo] = _levenshtein_ratio_dp(_subset(a, todo), _subset(b, todo), max_len)
    return out


def _dp_dist(A: np.ndarray, B: np.ndarray, la: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Batched Levenshtein DP core over pre-padded char matrices.

    DP rows advance together for the whole batch: ``cur[j]`` is a vector
    over pairs.  Complexity O(m*n) NumPy ops of width P.
    """
    p = len(la)
    m = int(la.max(initial=0))
    n = int(lb.max(initial=0))
    # int16 DP: distances are bounded by m+n — and the DP is
    # memory-bandwidth-bound, so halving the cell width is ~1.7x on the
    # scorer's hottest kernel (values identical)
    ramp = np.arange(n + 1, dtype=np.int16)
    prev = np.broadcast_to(ramp, (p, n + 1)).copy()
    # mask positions beyond each string's length so they never win the min
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]  # (p,1)
        sub = prev[:, :-1] + (ai != B[:, :n]).astype(np.int16)
        dele = prev[:, 1:] + 1
        cur[:, 1:] = np.minimum(sub, dele)
        # insertion needs left-to-right scan: cur[j] = min(cur[j], cur[j-1]+1)
        np.minimum.accumulate(cur - ramp, axis=1, out=cur)
        cur += ramp
        # rows where i > len(a): distance row is meaningless; freeze prev
        done = la < i
        cur[done] = prev[done]
        prev = cur
    return prev[np.arange(p), lb].astype(np.int64)


def _dp_dist_myers(A: np.ndarray, B: np.ndarray, la: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Myers bit-parallel Levenshtein over pre-padded char matrices,
    batch-vectorized over pairs (Myers 1999 / Hyyrö 2001).

    Each pair's DP column lives in ONE uint64 (requires ``la <= 64``),
    so a text character advances the whole batch with ~12 uint64 vector
    ops instead of the classic DP's O(m) int16-row sweeps — exact same
    distances, ~m× less memory traffic on the scorer's hottest kernel.
    """
    p = len(la)
    m = int(la.max(initial=0))
    n = int(lb.max(initial=0))
    assert m <= 64, "Myers kernel requires pattern length <= 64"
    rows = np.arange(p)
    one = np.uint64(1)

    # Peq[r, c] = bitmask of positions i where A[r, i] == c
    peq = np.zeros((p, 256), dtype=np.uint64)
    for i in range(m):
        act = i < la
        peq[rows[act], A[act, i]] |= np.uint64(1 << i)

    vp = np.full(p, ~np.uint64(0))
    vn = np.zeros(p, dtype=np.uint64)
    score = la.astype(np.int64).copy()
    highbit = np.left_shift(one, (la - 1).astype(np.uint64))
    zero64 = np.uint64(0)
    for j in range(n):
        active = j < lb
        eq = peq[rows, B[:, j]]
        xv = eq | vn
        xh = (((eq & vp) + vp) ^ vp) | eq
        hp = vn | ~(xh | vp)
        hn = vp & xh
        score += ((hp & highbit) != zero64) & active
        score -= ((hn & highbit) != zero64) & active
        hp = (hp << one) | one
        hn = hn << one
        vp = hn | ~(xv | hp)
        vn = hp & xv
    return score


# buckets at/under this width run the classic DP: for tiny strings the
# Myers Peq table build/gather costs more than an 8-wide int16 sweep
_MYERS_MIN_WIDTH = 16

# pair-chunk for the bit-parallel kernels: both allocate a (p, 256)
# uint64 Peq table (2 KB/pair), and first-touch page faults run ~100 MB/s
# on cgroup-limited hosts — chunking bounds the table at ~8 MB so it
# stays inside the worker's warm malloc pool across calls
_BITS_CHUNK = 4096


def _chunked(kernel, A, B, la, lb, *args) -> np.ndarray:
    p = len(la)
    if p <= _BITS_CHUNK:
        return kernel(A, B, la, lb, *args)
    outs = [
        kernel(A[o : o + _BITS_CHUNK], B[o : o + _BITS_CHUNK],
               la[o : o + _BITS_CHUNK], lb[o : o + _BITS_CHUNK], *args)
        for o in range(0, p, _BITS_CHUNK)
    ]
    return np.concatenate(outs)

_LEN_BUCKETS = (8, 16, 32, 64)


def _levenshtein_ratio_dp(
    a: pa.Array | pa.ChunkedArray, b: pa.Array | pa.ChunkedArray, max_len: int = 128
) -> np.ndarray:
    """1 - dist/max(len) for each pair, float32 in [0, 1].

    Exactly the DP distance on the ``max_len``-truncated strings, but
    computed after stripping each pair's common prefix and suffix (edit
    operations never touch them) and length-bucketing the remainders so
    each bucket's DP runs at its own width.
    """
    assert max_len <= 8192, "int16 DP holds distances <= 2*max_len"
    A, la = _pad_matrix(a, max_len)
    B, lb = _pad_matrix(b, max_len)
    p = len(la)
    if p == 0:
        return np.empty(0, dtype=np.float32)
    minlen = np.minimum(la, lb)

    # --- common prefix: first column where chars differ (or minlen) ---
    wp = int(minlen.max(initial=0))
    if wp:
        jc = np.arange(wp)
        stop = (A[:, :wp] != B[:, :wp]) | (jc[None, :] >= minlen[:, None])
        pref = np.where(stop.any(axis=1), np.argmax(stop, axis=1), minlen)
    else:
        pref = np.zeros(p, dtype=np.int64)

    # --- common suffix of the prefix-stripped remainders ---
    rem = minlen - pref
    wr = int(rem.max(initial=0))
    if wr:
        kc = np.arange(wr)
        rows = np.arange(p)[:, None]
        valid = kc[None, :] < rem[:, None]
        ca = np.where(valid, la[:, None] - 1 - kc[None, :], 0)
        cb = np.where(valid, lb[:, None] - 1 - kc[None, :], 0)
        stop_r = (A[rows, ca] != B[rows, cb]) | ~valid
        suff = np.where(stop_r.any(axis=1), np.argmax(stop_r, axis=1), rem)
    else:
        suff = np.zeros(p, dtype=np.int64)

    la2 = la - pref - suff
    lb2 = lb - pref - suff
    # one side empty after stripping -> dist is just the other's length
    dist = np.maximum(la2, lb2)

    nontriv = np.flatnonzero((la2 > 0) & (lb2 > 0))
    if len(nontriv):
        w2 = np.maximum(la2, lb2)
        lo = 0
        for bound in (*_LEN_BUCKETS, max_len):
            if lo >= max_len:
                break
            sel = nontriv[(w2[nontriv] > lo) & (w2[nontriv] <= bound)]
            lo = bound
            if not len(sel):
                continue
            las, lbs = la2[sel], lb2[sel]
            wa, wb = int(las.max()), int(lbs.max())
            colsa = np.arange(wa)[None, :]
            colsb = np.arange(wb)[None, :]
            rows = sel[:, None]
            ps = pref[sel][:, None]
            Asub = np.where(colsa < las[:, None], A[rows, np.minimum(ps + colsa, A.shape[1] - 1)], 0)
            Bsub = np.where(colsb < lbs[:, None], B[rows, np.minimum(ps + colsb, B.shape[1] - 1)], 0)
            if bound > _MYERS_MIN_WIDTH and wa > 64 and wb <= 64:
                # Levenshtein is symmetric; make the <=64 side the pattern
                Asub, Bsub, las, lbs, wa, wb = Bsub, Asub, lbs, las, wb, wa
            if bound > _MYERS_MIN_WIDTH and wa <= 64:
                dist[sel] = _chunked(_dp_dist_myers, Asub, Bsub, las, lbs)
            else:
                dist[sel] = _dp_dist(Asub, Bsub, las, lbs)

    denom = np.maximum(np.maximum(la, lb), 1).astype(np.float32)
    out = 1.0 - dist.astype(np.float32) / denom
    both_empty = (la == 0) & (lb == 0)
    out[both_empty] = 1.0
    return out.astype(np.float32)


def jaro_winkler(
    a: pa.Array | pa.ChunkedArray,
    b: pa.Array | pa.ChunkedArray,
    max_len: int = 64,
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.0,
    floor_transpositions: bool = False,
    out_dtype=np.float32,
) -> np.ndarray:
    """Jaro-Winkler similarity per pair, ``out_dtype`` in [0, 1].

    ``boost_threshold`` gates the Winkler prefix boost: the boost is
    applied only where the raw Jaro score exceeds it.  The classic
    Winkler (and DuckDB / rapidfuzz) convention is 0.7; this engine's
    linkage scorer historically boosts unconditionally, so the default
    stays 0.0 for backward compatibility.  ``floor_transpositions``
    selects the original strcmp95 / rapidfuzz / DuckDB convention of
    integer-dividing the mismatched-position count by 2 (``t = k // 2``)
    instead of the textbook half-count (``t = k / 2``); set both knobs
    (0.7, True, np.float64) for bit-exact DuckDB
    ``jaro_winkler_similarity`` parity."""
    eq = _equal_mask(a, b)
    out = np.ones(len(eq), dtype=out_dtype)
    todo = np.flatnonzero(~eq)
    if len(todo):
        out[todo] = _jaro_winkler_impl(
            _subset(a, todo), _subset(b, todo), max_len, prefix_weight,
            boost_threshold, floor_transpositions, out_dtype,
        )
    return out


def _jaro_winkler_impl(
    a: pa.Array | pa.ChunkedArray,
    b: pa.Array | pa.ChunkedArray,
    max_len: int = 64,
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.0,
    floor_transpositions: bool = False,
    out_dtype=np.float32,
) -> np.ndarray:
    """Jaro-Winkler similarity per pair: length-bucketed so each bucket's
    match-window sweep runs at its own matrix width."""
    A, la = _pad_matrix(a, max_len)
    B, lb = _pad_matrix(b, max_len)
    p = len(la)
    if p == 0:
        return np.empty(0, dtype=out_dtype)
    out = np.ones(p, dtype=out_dtype)  # w == 0 (both empty) -> 1.0
    w = np.maximum(la, lb)
    lo = 0
    for bound in (*_LEN_BUCKETS, max_len):
        if lo >= max_len:
            break
        sel = np.flatnonzero((w > lo) & (w <= bound))
        lo = bound
        if not len(sel):
            continue
        wa = min(A.shape[1], bound)
        wb = min(B.shape[1], bound)
        if bound > _MYERS_MIN_WIDTH and bound <= 64:
            out[sel] = _chunked(
                _jw_core_bits, A[sel, :wa], B[sel, :wb], la[sel], lb[sel],
                prefix_weight, boost_threshold, floor_transpositions,
                out_dtype,
            )
        else:
            out[sel] = _jw_core(
                A[sel, :wa], B[sel, :wb], la[sel], lb[sel],
                prefix_weight, boost_threshold, floor_transpositions,
                out_dtype,
            )
    return out


def _jw_core(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    prefix_weight: float,
    boost_threshold: float = 0.0,
    floor_transpositions: bool = False,
    out_dtype=np.float32,
) -> np.ndarray:
    """Jaro-Winkler over pre-padded char matrices, batch-vectorized over
    the match window per character position."""
    p = len(la)
    m = int(max(la.max(initial=0), lb.max(initial=0)))
    wb = B.shape[1]
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    matched_a = np.zeros((p, A.shape[1]), dtype=bool)
    matched_b = np.zeros((p, wb), dtype=bool)
    jcols = np.arange(wb)
    for i in range(m):
        active = i < la
        if not active.any():
            break
        lo = np.maximum(i - window, 0)[:, None]
        hi = np.minimum(i + window + 1, lb)[:, None]
        cand = (
            (jcols[None, :] >= lo)
            & (jcols[None, :] < hi)
            & (~matched_b)
            & (B == A[:, i][:, None])
            & active[:, None]
        )
        # first candidate j per row (greedy, as in the classic algorithm)
        has = cand.any(axis=1)
        first = np.argmax(cand, axis=1)
        rows = np.flatnonzero(has)
        matched_b[rows, first[rows]] = True
        matched_a[rows, i] = True

    return _jw_finish(A, B, la, lb, matched_a, matched_b, prefix_weight, boost_threshold, floor_transpositions, out_dtype)


def _jw_core_bits(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    prefix_weight: float,
    boost_threshold: float = 0.0,
    floor_transpositions: bool = False,
    out_dtype=np.float32,
) -> np.ndarray:
    """Bit-parallel Jaro match loop: each pair's matched-in-``b`` set and
    match window live in ONE uint64 (requires ``lb <= 64``), so one
    pattern position advances the whole batch with ~10 uint64 vector ops
    instead of O(len_b)-wide boolean matrix sweeps.  Greedy first-free-
    candidate semantics (lowest set bit) are identical to the matrix
    path; outputs are bit-identical."""
    p = len(la)
    m = int(la.max(initial=0))
    wb = B.shape[1]
    assert wb <= 64, "bit-parallel JW requires len_b <= 64"
    rows = np.arange(p)
    one = np.uint64(1)
    full = ~np.uint64(0)
    zero = np.uint64(0)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    # PeqB[r, c] = bitmask of positions j < lb where B[r, j] == c
    peq = np.zeros((p, 256), dtype=np.uint64)
    for j in range(wb):
        act = j < lb
        peq[rows[act], B[act, j]] |= np.uint64(1 << j)

    def lowbits(x: np.ndarray) -> np.ndarray:
        # (1 << x) - 1, exact at x == 64 (shift-by-width is UB)
        x = np.asarray(x)
        shifted = np.left_shift(one, np.where(x >= 64, 0, x).astype(np.uint64)) - one
        return np.where(x >= 64, full, shifted)

    matched_b = np.zeros(p, dtype=np.uint64)
    matched_a = np.zeros((p, A.shape[1]), dtype=bool)
    for i in range(m):
        active_mask = np.where(i < la, full, zero)
        lo = np.maximum(i - window, 0)
        hi = np.minimum(i + window + 1, lb)
        wmask = lowbits(hi) & ~lowbits(lo)
        cand = peq[rows, A[:, i]] & wmask & ~matched_b & active_mask
        lowbit = cand & (~cand + one)  # first free candidate j
        matched_b |= lowbit
        matched_a[:, i] = cand != zero

    mb = (
        (matched_b[:, None] >> np.arange(wb, dtype=np.uint64)[None, :]) & one
    ).astype(bool)
    return _jw_finish(A, B, la, lb, matched_a, mb, prefix_weight, boost_threshold, floor_transpositions, out_dtype)


def _jw_finish(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    matched_a: np.ndarray,
    matched_b: np.ndarray,
    prefix_weight: float,
    boost_threshold: float = 0.0,
    floor_transpositions: bool = False,
    out_dtype=np.float32,
) -> np.ndarray:
    """Shared Jaro-Winkler tail: transpositions over the matched chars,
    the Jaro combination, and the Winkler prefix boost."""
    p = len(la)
    wb = B.shape[1]
    mcount = matched_a.sum(axis=1).astype(np.float64)

    # transpositions: compare matched chars of a (in order) vs matched of b
    t = np.zeros(p, dtype=np.float64)
    ga = _gather_matched(A, matched_a)
    gb = _gather_matched(B, matched_b)
    k = min(ga.shape[1], gb.shape[1])
    if k:
        valid = np.arange(k)[None, :] < mcount[:, None]
        k_mism = ((ga[:, :k] != gb[:, :k]) & valid).sum(axis=1)
        t = (k_mism // 2).astype(np.float64) if floor_transpositions else k_mism / 2.0

    la_f = np.maximum(la, 1).astype(np.float64)
    lb_f = np.maximum(lb, 1).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        jaro = np.where(
            mcount > 0,
            (mcount / la_f + mcount / lb_f + (mcount - t) / np.maximum(mcount, 1)) / 3.0,
            0.0,
        )
    both_empty = (la == 0) & (lb == 0)
    jaro[both_empty] = 1.0

    # Winkler prefix boost (common prefix up to 4; the boost needs
    # i < la and i < lb anyway, so capping at the matrix widths is exact)
    pref = np.zeros(p, dtype=np.int64)
    upto = min(4, A.shape[1], wb)
    still = np.ones(p, dtype=bool)
    for i in range(upto):
        eq = (A[:, i] == B[:, i]) & (i < la) & (i < lb) & still
        pref += eq
        still &= eq
    boost = np.where(jaro > boost_threshold, pref * prefix_weight * (1.0 - jaro), 0.0)
    jw = jaro + boost
    return jw.astype(out_dtype)


def _gather_matched(M: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Row-wise compaction of masked chars into a left-aligned matrix."""
    counts = mask.sum(axis=1)
    width = int(counts.max(initial=0))
    p = M.shape[0]
    out = np.zeros((p, max(width, 1)), dtype=np.uint8)
    rows, cols = np.nonzero(mask)
    pos = np.arange(len(rows)) - np.repeat(np.cumsum(counts) - counts, counts)
    out[rows, pos] = M[rows, cols]
    return out
