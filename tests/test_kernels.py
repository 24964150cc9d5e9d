"""Unit tests for the vectorized kernels vs naive Python oracles.

Mirrors the reference's oracle-cross-check strategy (SURVEY.md §5:
``SimplifiedBruteForceSearcher`` is the oracle for the optimized
searchers, tests/models/test_recall_calculator.py:48-61).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from mel_ray.functions.hashing import (
    hash_strings64,
    sha256_hex,
    string_array_buffers,
    substring_hasher,
)
from mel_ray.functions.minhash import (
    band_keys,
    estimate_jaccard,
    exact_jaccard,
    minhash_signature,
)
from mel_ray.functions.shingles import char_kgram_hashes, line_shingles, word_ngram_hashes
from mel_ray.functions.simhash import hamming64, simhash64
from mel_ray.functions.strsim import jaro_winkler, levenshtein_ratio
from mel_ray.functions.embed import embed_strings, topk_cosine


class TestHashing:
    def test_distinct_and_deterministic(self):
        arr = pa.array(["", "a", "aa", "ab", "ba", "hello world", "a" * 1000])
        h1, h2 = hash_strings64(arr), hash_strings64(arr)
        assert len(set(h1.tolist())) == len(arr)
        assert (h1 == h2).all()

    def test_substring_consistency(self):
        # hash of a substring == hash of the same text as a standalone string
        whole = hash_strings64(pa.array(["hello world"]))[0]
        data, _ = string_array_buffers(pa.array(["xxhello worldyy"]))
        hs = substring_hasher(data)
        assert hs(np.array([2]), np.array([13]))[0] == whole

    def test_sha256_matches_hashlib(self):
        texts = ["", "abc", "x" * 999, "unicode é中"]
        got = sha256_hex(pa.array(texts))
        for t, g in zip(texts, got):
            assert g.as_py() == hashlib.sha256(t.encode()).hexdigest()


class TestShingles:
    def test_line_shingles_normalization(self):
        docs = pa.array(["  a b \n\n c\nd", "c\n  a b", "", "\n\n", "z"])
        v, off = line_shingles(docs)
        counts = (off[1:] - off[:-1]).tolist()
        assert counts == [3, 2, 0, 0, 1]
        s0 = set(v[off[0] : off[1]].tolist())
        s1 = set(v[off[1] : off[2]].tolist())
        assert len(s0 & s1) == 2  # "a b" and "c" shared, whitespace-insensitively

    def test_char_kgrams(self):
        data, off = string_array_buffers(pa.array(["abcd", "ab", ""]))
        _, ko = char_kgram_hashes(data, off, 3)
        assert ko.tolist() == [0, 2, 3, 3]

    def test_word_ngrams(self):
        v, off = word_ngram_hashes(
            pa.array(["the quick brown fox", "Quick brown fox the", "", "one"]), n=3
        )
        assert (off[1] - off[0]) == 2
        s0 = set(v[off[0] : off[1]].tolist())
        s1 = set(v[off[1] : off[2]].tolist())
        assert len(s0 & s1) == 1  # "quick brown fox" (case-insensitive)
        assert (off[3] - off[2]) == 0 and (off[4] - off[3]) == 1


class TestMinHash:
    def test_estimate_tracks_exact_jaccard(self):
        rng = np.random.RandomState(0)
        base = rng.randint(0, 2**63, 500).astype(np.uint64)
        vals, offs = [], [0]
        for frac in [1.0, 0.9, 0.7, 0.5, 0.2]:
            keep = base[: int(500 * frac)]
            extra = rng.randint(0, 2**63, 500 - len(keep)).astype(np.uint64)
            s = np.concatenate([keep, extra])
            vals.append(s)
            offs.append(offs[-1] + len(s))
        values = np.concatenate(vals)
        offsets = np.array(offs)
        sig = minhash_signature(values, offsets, 128)
        for i in range(1, 5):
            ej = exact_jaccard(values, offsets, 0, i)
            est = estimate_jaccard(sig[0:1], sig[i : i + 1])[0]
            assert abs(ej - est) < 0.15

    def test_band_shapes_and_empty_rows(self):
        values = np.arange(10, dtype=np.uint64)
        offsets = np.array([0, 5, 5, 10])  # middle row empty
        sig = minhash_signature(values, offsets, 64)
        assert sig.shape == (3, 64)
        assert (sig[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        bid, bh = band_keys(sig, 16)
        assert len(bid) == 3 * 16 and len(bh) == 3 * 16
        # identical shingle sets -> identical bands
        sig2 = minhash_signature(values, np.array([0, 5, 5, 10]), 64)
        assert (sig == sig2).all()


class TestSimHash:
    def test_near_dup_has_smaller_hamming(self):
        rng = np.random.RandomState(1)
        base = rng.randint(0, 2**63, 400).astype(np.uint64)
        near = np.concatenate([base[:360], rng.randint(0, 2**63, 40).astype(np.uint64)])
        far = rng.randint(0, 2**63, 400).astype(np.uint64)
        values = np.concatenate([base, near, far])
        offsets = np.array([0, 400, 800, 1200])
        sh = simhash64(values, offsets)
        d_near = hamming64(sh[0:1], sh[1:2])[0]
        d_far = hamming64(sh[0:1], sh[2:3])[0]
        assert d_near < d_far
        assert d_near <= 12


def _naive_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = min(prev + (a[i - 1] != b[j - 1]), dp[j] + 1, dp[j - 1] + 1)
            prev, dp[j] = dp[j], cur
    return dp[len(b)]


def _naive_jw(a: str, b: str, p: float = 0.1) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    w = max(max(len(a), len(b)) // 2 - 1, 0)
    m1, m2 = [False] * len(a), [False] * len(b)
    matches = 0
    for i, c in enumerate(a):
        for j in range(max(0, i - w), min(len(b), i + w + 1)):
            if not m2[j] and b[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    s1 = [c for i, c in enumerate(a) if m1[i]]
    s2 = [c for j, c in enumerate(b) if m2[j]]
    t = sum(x != y for x, y in zip(s1, s2)) / 2
    jaro = (matches / len(a) + matches / len(b) + (matches - t) / matches) / 3
    pref = 0
    for x, y in zip(a[:4], b[:4]):
        if x == y:
            pref += 1
        else:
            break
    return jaro + pref * p * (1 - jaro)


class TestStringSim:
    @pytest.fixture(scope="class")
    def pairs(self):
        random.seed(7)
        A, B = [], []
        for _ in range(300):
            A.append("".join(random.choice("abcd/_") for _ in range(random.randint(0, 14))))
            B.append("".join(random.choice("abcd/_") for _ in range(random.randint(0, 14))))
        return A, B

    def test_levenshtein_vs_naive(self, pairs):
        A, B = pairs
        got = levenshtein_ratio(pa.array(A), pa.array(B))
        for a, b, g in zip(A, B, got):
            exp = 1.0 if (not a and not b) else 1 - _naive_lev(a, b) / max(len(a), len(b), 1)
            assert abs(g - exp) < 1e-6, (a, b, g, exp)

    def test_jaro_winkler_vs_naive(self, pairs):
        A, B = pairs
        got = jaro_winkler(pa.array(A), pa.array(B))
        for a, b, g in zip(A, B, got):
            assert abs(g - _naive_jw(a, b)) < 1e-5, (a, b, g)

    def test_myers_kernel_matches_classic_dp(self):
        """The bit-parallel Myers path (buckets wider than
        _MYERS_MIN_WIDTH) must be distance-identical to the classic DP
        and the naive oracle — long, correlated, path-like strings."""
        from mel_ray.functions.strsim import _dp_dist, _dp_dist_myers

        random.seed(23)
        A, B = [], []
        for _ in range(400):
            la, lb = random.randint(0, 70), random.randint(0, 70)
            a = "".join(random.choice("abcdxy/_.") for _ in range(la))
            b = "".join(random.choice("abcdxy/_.") for _ in range(lb))
            if random.random() < 0.5:  # shared prefixes, like fork paths
                b = a[: random.randint(0, la)] + b
            A.append(a), B.append(b)
        got = levenshtein_ratio(pa.array(A), pa.array(B), max_len=64)
        for a, b, g in zip(A, B, got):
            a, b = a[:64], b[:64]
            exp = 1.0 if (not a and not b) else 1 - _naive_lev(a, b) / max(len(a), len(b), 1)
            assert abs(g - exp) < 1e-6, (a, b, g, exp)
        # kernel-vs-kernel on random padded matrices (all lengths 1..64)
        rng = np.random.default_rng(5)
        p = 300
        la = rng.integers(1, 65, p)
        lb = rng.integers(1, 65, p)
        Am = rng.integers(97, 123, (p, 64), dtype=np.uint8) * (np.arange(64) < la[:, None])
        Bm = rng.integers(97, 123, (p, 64), dtype=np.uint8) * (np.arange(64) < lb[:, None])
        assert (_dp_dist(Am, Bm, la, lb) == _dp_dist_myers(Am, Bm, la, lb)).all()

    def test_jw_bits_matches_matrix_core(self):
        """The bit-parallel Jaro match loop must be bit-identical to the
        boolean-matrix core on long strings (both vs the naive oracle)."""
        import mel_ray.functions.strsim as strsim

        random.seed(31)
        A, B = [], []
        for _ in range(400):
            la, lb = random.randint(0, 64), random.randint(0, 64)
            a = "".join(random.choice("abcdxy/_.") for _ in range(la))
            b = "".join(random.choice("abcdxy/_.") for _ in range(lb))
            if random.random() < 0.5:
                b = a[: random.randint(0, la)] + b[:64 - min(la, lb)]
            A.append(a), B.append(b[:64])
        Aa, Bb = pa.array(A), pa.array(B)
        got_bits = jaro_winkler(Aa, Bb)
        saved = strsim._MYERS_MIN_WIDTH
        try:
            strsim._MYERS_MIN_WIDTH = 10_000  # force the matrix core
            got_matrix = jaro_winkler(Aa, Bb)
        finally:
            strsim._MYERS_MIN_WIDTH = saved
        assert (got_bits == got_matrix).all()
        for a, b, g in zip(A, B, got_bits):
            assert abs(g - _naive_jw(a, b)) < 1e-5, (a, b, g)


class TestEmbed:
    def test_self_similarity_and_ordering(self):
        texts = pa.array(
            [
                "def compute_total(items): return sum(i.price for i in items)",
                "def compute_total(items): return sum(x.price for x in items)",
                "SELECT * FROM completely_different_table WHERE z > 9",
            ]
        )
        emb = embed_strings(texts)
        assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
        near = float(emb[0] @ emb[1])
        far = float(emb[0] @ emb[2])
        assert near > 0.8 > far

    def test_topk_matches_naive(self):
        rng = np.random.RandomState(3)
        index = rng.randn(50, 16).astype(np.float32)
        index /= np.linalg.norm(index, axis=1, keepdims=True)
        queries = index[:5]
        idx, sims = topk_cosine(queries, index, 4)
        full = queries @ index.T
        for q in range(5):
            order = np.lexsort((np.arange(50), -full[q]))[:4]
            assert idx[q].tolist() == order.tolist()
            assert idx[q][0] == q  # self is nearest


def test_hll_sketch_accuracy_and_merge():
    """HLL estimate within 5% at b=12; merge(a,b) == sketch(a ∪ b)."""
    from mel_ray.functions.sketch import hash_keys, hll_estimate, hll_merge, hll_partial

    rng = np.random.RandomState(11)
    keys = rng.randint(0, 10**12, size=50_000)
    uniq = len(np.unique(keys))
    h = hash_keys(keys)
    est = hll_estimate(hll_partial(h, 12))
    assert abs(est - uniq) / uniq < 0.05, (est, uniq)
    # mergeability
    a, b = h[:20_000], h[20_000:]
    merged = hll_merge(hll_partial(a, 12), hll_partial(b, 12))
    assert (merged == hll_partial(h, 12)).all()
    # small-range correction path
    small = hash_keys(np.arange(10))
    assert abs(hll_estimate(hll_partial(small, 12)) - 10) < 1


def test_content_window_bounds_featurize_work():
    """M8/M9: with content_window set, only the first N codepoints feed
    shingling — a record with a huge tail featurizes identically to its
    truncated twin."""
    import pyarrow as pa

    from mel_ray.config import BlockingConfig
    from mel_ray.stages.blocking import binary_matrix, featurize_batch

    head = "def f():\n    return 1\n"
    big = head + ("x = 2\n" * 5000)
    batch = pa.table(
        {
            "record_id": pa.array([1, 2], pa.int64()),
            "repo": pa.array(["r", "r"]),
            "path": pa.array(["a.py", "b.py"]),
            "sha256": pa.array(["s1", "s2"]),
            "content": pa.array([big, big[: len(head)]]),
        }
    )
    cfg = BlockingConfig(content_window=len(head))
    out = featurize_batch(batch, cfg, 64, 4)
    sig = binary_matrix(out["sig"], np.uint32)
    assert (sig[0] == sig[1]).all()
    # default (None) sees the tail: signatures differ
    out2 = featurize_batch(batch, BlockingConfig(), 64, 4)
    sig2 = binary_matrix(out2["sig"], np.uint32)
    assert not (sig2[0] == sig2[1]).all()


class TestPairEmissionAccounting:
    """No-silent-caps: every semantic degradation of the pair set
    (stopband drop, salting, star-pair cap) is counted in the stats row."""

    @staticmethod
    def _bucket(band_sizes):
        rows_bh, rows_rid = [], []
        next_id = 0
        for bh, size in enumerate(band_sizes):
            for _ in range(size):
                rows_bh.append(bh)
                rows_rid.append(next_id)
                next_id += 1
        return pa.table(
            {
                "record_id": pa.array(rows_rid, pa.int64()),
                "band_hash": pa.array(rows_bh, pa.int64()),
                "bucket": pa.array([0] * len(rows_bh), pa.int32()),
            }
        )

    def test_star_pair_cap_is_counted(self):
        from mel_ray.config import BlockingConfig
        from mel_ray.stages.blocking import _emit_pairs_for_bucket

        cfg = BlockingConfig(salt_limit=64, stopband_limit=4096, max_pairs_per_group=10)
        out = _emit_pairs_for_bucket(self._bucket([6]), cfg)  # C(6,2)=15 > 10
        stats = out.filter(pa.compute.equal(out["id_a"], pa.scalar(-1, pa.int64())))
        assert stats["capped_groups"][0].as_py() == 1
        assert stats["dropped_bands"][0].as_py() == 0
        pairs = out.filter(pa.compute.not_equal(out["id_a"], pa.scalar(-1, pa.int64())))
        # star fallback: 5 pairs to the min member, not the 15 all-pairs
        assert len(pairs) == 5
        assert set(pairs["id_a"].to_pylist()) == {0}

    def test_uncapped_band_not_counted(self):
        from mel_ray.config import BlockingConfig
        from mel_ray.stages.blocking import _emit_pairs_for_bucket

        cfg = BlockingConfig(salt_limit=64, stopband_limit=4096, max_pairs_per_group=100)
        out = _emit_pairs_for_bucket(self._bucket([6, 3]), cfg)
        stats = out.filter(pa.compute.equal(out["id_a"], pa.scalar(-1, pa.int64())))
        assert stats["capped_groups"][0].as_py() == 0
        pairs = out.filter(pa.compute.not_equal(out["id_a"], pa.scalar(-1, pa.int64())))
        assert len(pairs) == 15 + 3


def test_scorer_gpu_knob_is_noop_at_zero():
    """num_gpus=0 must not change the map_batches kwargs at all (this
    sandbox is CPU-only); a positive value passes straight through."""
    from mel_ray.config import ScoringConfig
    from mel_ray.stages.scoring import _gpu_args

    assert _gpu_args(ScoringConfig()) == {}
    assert _gpu_args(ScoringConfig(num_gpus=0.25)) == {"num_gpus": 0.25}


def test_strsim_equal_fast_path_identical_to_dp():
    """The equality fast path must be value-identical to the full DP on
    equal strings (and leave unequal pairs untouched)."""
    import pyarrow as pa

    from mel_ray.functions.strsim import (
        _jaro_winkler_impl,
        _levenshtein_ratio_dp,
        jaro_winkler,
        levenshtein_ratio,
    )

    a = pa.array(["abc/def.py", "", "same", "kitten", "x" * 100])
    b = pa.array(["abc/def.py", "", "same", "sitting", "x" * 100])
    jw = jaro_winkler(a, b)
    lev = levenshtein_ratio(a, b, max_len=64)
    jw_full = _jaro_winkler_impl(a, b)
    lev_full = _levenshtein_ratio_dp(a, b, max_len=64)
    assert (jw == jw_full).all()
    assert (lev == lev_full).all()
    assert jw[0] == jw[1] == jw[2] == 1.0
    assert lev[4] == 1.0


def test_ntile_ids_matches_duckdb_all_small_sizes():
    """ntile_per_key's tile formula vs DuckDB NTILE for every partition
    size the bucketed tiler can see, including s < n (each row its own
    tile) — the test data never exercises small partitions."""
    import duckdb
    import numpy as np

    from mel_ray.relational import ntile_ids

    for n in (2, 4, 7):
        for s in range(1, 30):
            i = np.arange(s)
            mine = ntile_ids(i, np.full(s, s, dtype=np.int64), n).tolist()
            ref = [
                r[0]
                for r in duckdb.sql(
                    f"SELECT ntile({n}) OVER (ORDER BY x) "
                    f"FROM (SELECT unnest(range({s})) x)"
                ).fetchall()
            ]
            assert mine == ref, (n, s)


def test_binary_matrix_single_chunk_is_zero_copy():
    """The broadcast scorer's views must be true views: pyarrow 16's
    combine_chunks() copies even single-chunk arrays, which collapsed
    under concurrent first-touch on cgroup-limited hosts (round-5 find:
    37 s/worker views builds).  Pin the chunk(0) fast path."""
    import pyarrow as pa

    from mel_ray.stages.blocking import binary_matrix

    rows = np.arange(64, dtype=np.uint32).reshape(8, 8)
    flat = rows.tobytes()
    width = rows.shape[1] * 4
    offsets = pa.array(np.arange(0, (8 + 1) * width, width, dtype=np.int32))
    arr = pa.Array.from_buffers(
        pa.binary(), 8, [None, offsets.buffers()[1], pa.py_buffer(flat)]
    )
    chunked = pa.chunked_array([arr])

    out = binary_matrix(chunked, np.uint32)
    assert (out == rows).all()
    # zero-copy: the ndarray's memory IS the arrow buffer's
    src_addr = arr.buffers()[2].address
    assert out.__array_interface__["data"][0] == src_addr

    # multi-chunk inputs still combine (copy) and stay correct
    two = pa.chunked_array([arr.slice(0, 4), arr.slice(4, 4)])
    out2 = binary_matrix(two, np.uint32)
    assert (out2 == rows).all()
