"""Edit-distance self-join: pigeonhole-blocking completeness + exact
parity with DuckDB ``levenshtein`` (the oracle the driver replays)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from mel_ray.fuzzyjoin import (
    _emit_keys,
    _segment_partition,
    fuzzy_lev_self_join,
    lev_distance,
)


def _brute_pairs(strings: list[str], d: int) -> set[tuple[str, str, int]]:
    con = duckdb.connect()
    con.register("p", pa.table({"s": pa.array(sorted(set(strings)))}))
    rows = con.execute(
        "SELECT a.s, b.s, levenshtein(a.s, b.s) FROM p a JOIN p b "
        "ON a.s < b.s WHERE levenshtein(a.s, b.s) <= ?",
        [d],
    ).fetchall()
    return {(a, b, int(dd)) for a, b, dd in rows}


def _rand_strings(rng: np.random.Generator, n: int) -> list[str]:
    """Base strings + planted <=2-edit variants (every edit kind,
    including edits AT segment boundaries and string middles — the
    pigeonhole window's tight spots)."""
    alpha = list("abcdefg/._")
    out = []
    for _ in range(n):
        L = int(rng.integers(6, 24))
        s = "".join(rng.choice(alpha) for _ in range(L))
        out.append(s)
        for _ in range(int(rng.integers(1, 4))):
            t = list(s)
            for _ in range(int(rng.integers(1, 3))):  # 1 or 2 edits
                kind = int(rng.integers(3))
                pos = int(rng.integers(0, max(len(t), 1)))
                if kind == 0 and t:  # substitute
                    t[min(pos, len(t) - 1)] = str(rng.choice(alpha))
                elif kind == 1:  # insert
                    t.insert(pos, str(rng.choice(alpha)))
                elif t:  # delete
                    del t[min(pos, len(t) - 1)]
            if t:
                out.append("".join(t))
    return out


def test_segment_partition_covers_string():
    for l in range(1, 80):
        starts, widths = _segment_partition(l, 2)
        assert int(widths.sum()) == l
        assert starts[0] == 0
        assert all(starts[i] + widths[i] == (starts + widths)[i] for i in range(3))


def test_blocking_is_complete_no_ray():
    """Every true pair shares >=1 candidate key — the pigeonhole
    guarantee, checked WITHOUT Ray on seeded random strings."""
    rng = np.random.default_rng(7)
    strings = sorted(set(s for s in _rand_strings(rng, 60) if s))
    t = pa.table({"s": pa.array(strings)})
    keys = _emit_keys(t, "s", 2)
    by_string: dict[str, tuple[set, set]] = {s: (set(), set()) for s in strings}
    for k, side, s in zip(
        keys["key"].to_pylist(), keys["side"].to_pylist(), keys["s"].to_pylist()
    ):
        by_string[s][side].add(k)
    truth = _brute_pairs(strings, 2)
    assert truth, "seeded corpus must contain true pairs"
    for a, b, _ in truth:
        la, lb = len(a), len(b)
        short, lng = (a, b) if la <= lb else (b, a)
        # index keys of the shorter must intersect probe keys of the longer
        assert by_string[short][0] & by_string[lng][1], (short, lng)


def test_lev_distance_matches_duckdb():
    rng = np.random.default_rng(11)
    strings = _rand_strings(rng, 40)
    a = pa.array(strings)
    b = pa.array(list(reversed(strings)))
    got = lev_distance(a, b)
    con = duckdb.connect()
    con.register("t", pa.table({"a": a, "b": b}))
    want = np.array(
        [r[0] for r in con.execute("SELECT levenshtein(a, b) FROM t").fetchall()]
    )
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed", [3, 19])
def test_self_join_matches_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    strings = sorted(set(s for s in _rand_strings(rng, 50) if s))
    ds = ray.data.from_arrow(pa.table({"path": pa.array(strings)})).repartition(4)
    got = {
        (r["path_a"], r["path_b"], int(r["dist"]))
        for r in fuzzy_lev_self_join(ds, "path", d=2).take_all()
    }
    want = _brute_pairs(strings, 2)
    assert got == want
    assert len(want) > 0


def test_self_join_dedupes_input_multiplicity(ray_session):
    # repeated values must behave like DISTINCT input: no self-pairs
    t = pa.table({"path": pa.array(["abcdef", "abcdef", "abcdeg", "zzzzzz"])})
    ds = ray.data.from_arrow(t)
    got = {
        (r["path_a"], r["path_b"], int(r["dist"]))
        for r in fuzzy_lev_self_join(ds, "path", d=2).take_all()
    }
    assert got == {("abcdef", "abcdeg", 1)}


# --- Jaro-Winkler DuckDB parity ---------------------------------------------
def _jw_rand_strings(rng: np.random.Generator, n: int) -> list[str]:
    words = ["red", "blue", "old", "hot", "cold", "small", "large", "dim"]
    nouns = ["widget", "wrench", "washer", "anvil", "bolt", "gear", "ring", "plate"]
    out = []
    for _ in range(n):
        w = str(rng.choice(words)) + " " + str(rng.choice(nouns))
        out.append(w)
        if rng.random() < 0.5:  # planted near-dup: one char typo
            t = list(w)
            t[int(rng.integers(0, len(t)))] = "xyz"[int(rng.integers(3))]
            out.append("".join(t))
    return out


@pytest.mark.parametrize("seed", [11, 12])
def test_jaro_winkler_duckdb_parity_bitexact(seed):
    """DuckDB-compat mode (boost gated at jaro>0.7, floored strcmp95
    transpositions, float64) is bit-identical to DuckDB's
    jaro_winkler_similarity — including odd mismatch counts (3-cycles)
    where the textbook half-count diverges."""
    from mel_ray.functions.strsim import jaro_winkler

    rng = np.random.default_rng(seed)
    strs = sorted(set(_jw_rand_strings(rng, 120)))
    # plus adversarial fixed cases: 3-cycle transposition, empty-ish, bound
    strs += ["abcxxxxx", "bcaxxxxx", "a", "ab", "ba", "hot gizmo", "hot plate"]
    # longer strings (17-64 chars) exercise the BIT-PARALLEL Jaro kernel
    # with the parity flags (the short names above stay on the matrix path)
    alpha = list("abcdefgh/._ ")
    for _ in range(40):
        L = int(rng.integers(17, 60))
        s = "".join(rng.choice(alpha) for _ in range(L))
        strs.append(s)
        t = list(s)  # planted near-dup: swap two positions + one sub
        i, j = rng.integers(0, L, size=2)
        t[i], t[j] = t[j], t[i]
        t[int(rng.integers(0, L))] = str(rng.choice(alpha))
        strs.append("".join(t))
    strs = sorted(set(strs))
    import itertools

    pairs = list(itertools.combinations(strs, 2))
    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    ours = jaro_winkler(
        a, b, boost_threshold=0.7, floor_transpositions=True, out_dtype=np.float64
    )
    con = duckdb.connect()
    con.register("t", pa.table({"a": a, "b": b}))
    theirs = np.array(
        [r[0] for r in con.execute("SELECT jaro_winkler_similarity(a,b) FROM t").fetchall()]
    )
    assert (ours == theirs).all(), np.abs(ours - theirs).max()


def test_jaro_winkler_legacy_default_unchanged():
    """The flagship scorer's historical semantics (unconditional boost,
    half-count transpositions, float32) stay the default."""
    from mel_ray.functions.strsim import jaro_winkler

    a = pa.array(["hot gizmo", "martha"])
    b = pa.array(["hot plate", "marhta"])
    out = jaro_winkler(a, b)
    assert out.dtype == np.float32
    # unconditional boost: jaro 0.6296 + 4*0.1*(1-0.6296)
    assert abs(float(out[0]) - 0.7777778) < 1e-6
    assert abs(float(out[1]) - 0.9611111) < 1e-6


def test_fuzzy_jw_join_matches_duckdb_at_sf(ray_session):
    from mel_ray.fuzzyjoin import fuzzy_jw_join

    res = fuzzy_jw_join("/root/testdata/sf0.001").to_pandas()
    res = res.sort_values(["name_a", "name_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW part AS SELECT * FROM '/root/testdata/sf0.001/part.parquet'"
    )
    exp = con.sql(
        """
        WITH p AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        FROM p a JOIN p b
          ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
         AND a.p_name < b.p_name
        WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
        ORDER BY name_a, name_b
        """
    ).df()
    assert len(res) == len(exp) and len(res) > 0
    assert (res["name_a"].to_numpy() == exp["name_a"].to_numpy()).all()
    assert (res["name_b"].to_numpy() == exp["name_b"].to_numpy()).all()
    assert (res["jw"].to_numpy() == exp["jw"].to_numpy()).all()  # bit-exact
