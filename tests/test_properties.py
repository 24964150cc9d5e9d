"""Property-based kernel invariants (hypothesis) — the reference's §5
"property-style invariants rather than golden values" strategy applied
with generated inputs instead of fixtures.  Pure-kernel tests: no Ray
session needed."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=200,
)


class TestRoundingProperties:
    @given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), st.integers(0, 6))
    @settings(max_examples=200, deadline=None)
    def test_round_half_away_matches_decimal(self, x, nd):
        from mel_ray.util import round_half_away

        got = round_half_away(np.array([x]), nd)[0]
        want = float(
            Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
        )
        # repr(x) is the shortest round-trip; quantize of that string is
        # exact half-away — allow one ulp of the scaled value for cases
        # where the binary double sits off the decimal tie
        assert abs(got - want) <= 10.0**-nd + 1e-9

    @given(st.integers(-1000, 1000))
    @settings(max_examples=100, deadline=None)
    def test_round_half_away_exact_ties(self, k):
        """Binary-representable decimal ties must round AWAY from zero,
        exactly — this is the case the tolerance above cannot police
        (half-to-even would differ by a full quantum here)."""
        from mel_ray.util import round_half_away

        # k + 0.5 at nd=0: tie, exactly representable in binary
        got = round_half_away(np.array([k + 0.5]), 0)[0]
        assert got == (k + 1 if k + 0.5 > 0 else k), (k, got)
        # k + 0.25 / k + 0.75 at nd=1: ties at the second decimal's half,
        # exactly representable (x/4); away-from-zero on the .x5 boundary
        got25 = round_half_away(np.array([k + 0.25]), 1)[0]
        want25 = (k + 0.3) if k + 0.25 > 0 else (k + 0.2)
        assert abs(got25 - round(want25, 10)) < 1e-9, (k, got25, want25)


class TestShingleProperties:
    @given(st.lists(TEXT, min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_word_ngrams_rows_independent(self, texts):
        """Row results must not depend on batch composition: hashing a
        row alone equals hashing it inside any batch (no cross-row
        state — the zero-copy buffer arithmetic is offset-correct)."""
        from mel_ray.functions.shingles import word_ngram_hashes

        arr = pa.array(texts, pa.string())
        v_all, off_all = word_ngram_hashes(arr, n=2)
        for i, t in enumerate(texts):
            v_one, off_one = word_ngram_hashes(pa.array([t], pa.string()), n=2)
            mine = v_all[off_all[i] : off_all[i + 1]]
            assert mine.tolist() == v_one[off_one[0] : off_one[1]].tolist()

    @given(st.lists(st.lists(st.integers(0, 2**63 - 1), max_size=20), min_size=1, max_size=6))
    @settings(max_examples=60, deadline=None)
    def test_ragged_unique_matches_sets(self, rows):
        from mel_ray.textops import _ragged_unique

        values = np.array([v for r in rows for v in r], dtype=np.uint64)
        offsets = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
        uv, uoff = _ragged_unique(values, offsets)
        for i, r in enumerate(rows):
            got = uv[uoff[i] : uoff[i + 1]].tolist()
            assert got == sorted(set(r))

    @given(st.lists(st.lists(st.integers(0, 2**63 - 1), max_size=16), min_size=1, max_size=5))
    @settings(max_examples=60, deadline=None)
    def test_ragged_binary_roundtrip(self, rows):
        from mel_ray.textops import _ragged_binary, _ragged_from_binary

        values = np.array([v for r in rows for v in r], dtype=np.uint64)
        offsets = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
        col = _ragged_binary(values, offsets)
        v2, off2 = _ragged_from_binary(col)
        assert v2.tolist() == values.tolist()
        assert off2.tolist() == offsets.tolist()


class TestSketchProperties:
    @given(st.lists(st.integers(0, 2**62), min_size=0, max_size=500), st.integers(0, 499))
    @settings(max_examples=40, deadline=None)
    def test_hll_merge_is_union(self, keys, split):
        """merge(sketch(A), sketch(B)) == sketch(A ∪ B) for ANY split —
        the mergeability contract that makes the aggregate distributable."""
        from mel_ray.functions.sketch import hash_keys, hll_merge, hll_partial

        h = hash_keys(np.array(keys, dtype=np.int64)) if keys else np.empty(0, np.uint64)
        cut = min(split, len(h))
        merged = hll_merge(hll_partial(h[:cut], 8), hll_partial(h[cut:], 8))
        assert (merged == hll_partial(h, 8)).all()

    @given(st.sets(st.integers(0, 2**40), min_size=1, max_size=300))
    @settings(max_examples=30, deadline=None)
    def test_hll_small_range_near_exact(self, keys):
        """Linear-counting regime: estimates within 15% for small sets
        at b=12 (statistically conservative bound)."""
        from mel_ray.functions.sketch import hash_keys, hll_estimate, hll_partial

        h = hash_keys(np.array(sorted(keys), dtype=np.int64))
        est = hll_estimate(hll_partial(h, 12))
        assert abs(est - len(keys)) <= max(3.0, 0.15 * len(keys))


class TestMinhashProperties:
    def test_trailing_empty_row_regression(self):
        """Pinned hypothesis counterexample: a zero-shingle row trailing
        the batch must not truncate the previous row's signature (the
        round-1 reduceat clamp bug)."""
        from mel_ray.functions.minhash import minhash_signature
        from mel_ray.functions.shingles import word_ngram_hashes

        v, off = word_ngram_hashes(pa.array(["0:0:1", ""], pa.string()), n=2)
        sig = minhash_signature(v, off, 32)
        v1, off1 = word_ngram_hashes(pa.array(["0:0:1"], pa.string()), n=2)
        sig1 = minhash_signature(v1, off1, 32)
        assert (sig[0] == sig1[0]).all()

    @given(st.lists(TEXT, min_size=2, max_size=5))
    @settings(max_examples=30, deadline=None)
    def test_signature_deterministic_and_batch_independent(self, texts):
        from mel_ray.functions.minhash import minhash_signature
        from mel_ray.functions.shingles import word_ngram_hashes

        arr = pa.array(texts, pa.string())
        v, off = word_ngram_hashes(arr, n=2)
        sig = minhash_signature(v, off, 32)
        for i, t in enumerate(texts):
            v1, off1 = word_ngram_hashes(pa.array([t], pa.string()), n=2)
            sig1 = minhash_signature(v1, off1, 32)
            assert (sig[i] == sig1[0]).all()


class TestIntervalAndQuantileProperties:
    @given(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=200),
        st.integers(1, 40),
        st.floats(1.0, 1e4),
        st.floats(0.0, 3e4),
    )
    @settings(max_examples=60, deadline=None)
    def test_interval_probe_matches_naive_masks(self, xs, nbands, step, width):
        """searchsorted probe == the O(n·K) per-interval boolean mask."""
        from mel_ray.relational import interval_probe

        x = np.asarray(xs, dtype=np.float64)
        los = np.arange(nbands, dtype=np.float64) * step
        his = los + width
        b_start, counts = interval_probe(x, los, his)
        for b in range(nbands):
            want = (x >= los[b]) & (x < his[b])
            got = (b_start <= b) & (b < b_start + counts)
            assert (want == got).all(), (b, los[b], his[b])

    @given(
        st.lists(st.integers(0, 50), min_size=1, max_size=100),
        st.floats(0.0, 1.0, allow_nan=False),
    )
    @settings(max_examples=60, deadline=None)
    def test_histogram_quantile_matches_numpy(self, values, q):
        """interp over a (value, count) histogram == np.quantile over the
        expanded multiset (DuckDB quantile_cont semantics)."""
        from mel_ray.relational import _interp_quantiles

        fn = _interp_quantiles("k", "v", ((q, "out"),))
        g = pa.table(
            {
                "k": ["g"] * len(set(values)),
                "v": sorted({float(v) for v in values}),
                "n": [values.count(v) for v in sorted(set(values))],
            }
        )
        got = fn(g)["out"][0].as_py()
        expanded = np.asarray(sorted(float(v) for v in values))
        from mel_ray.util import round_half_away

        want = float(round_half_away(np.quantile(expanded, q), 4))
        assert got == want, (got, want, values, q)
