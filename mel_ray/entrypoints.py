"""Driver contract implementation: ``entry`` / ``queries`` / ``oracle_sql``.

Every entry in :func:`queries` is one operator family from SURVEY.md §2
(the coverage checklist), implemented Ray-Data-first; where the result
is ANSI-SQL-expressible the matching DuckDB oracle is in
:func:`oracle_sql` (same column names, same rounding, both engines run
RE2 regexes).  Corpus-table queries run over the deterministic synthetic
``input_hint`` corpus generated under ``/tmp/mel_ray_corpus/<sf>/`` —
the oracle SQL reads the very same parquet files.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from . import annops, corpusops, fuzzyjoin, relational, sourceops, streamops, textops, tokenops
from .functions.textstats import _MARKER_RES, _SCRIPT_RES, BPE_RE, TOKEN_RE

_BPE_SQL = BPE_RE.replace("'", "''")

_CORPUS_SF001 = "/tmp/mel_ray_corpus/sf0.01"
_SOURCES_SF001 = "/tmp/mel_ray_sources/sf0.01"


def entry() -> Any:
    """Flagship: full record-linkage pipeline on the sf0.001-scale corpus."""
    return corpusops.linkage_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # Insertion order is load-bearing: the driver verifies the FIRST 50
    # entries (in order) against oracle_sql / rows-only checks, so
    # positions 1-50 hold 47 oracle-bearing queries plus three rows-only
    # checks (linkage_clusters, the north-rule pipeline; linkage_f1_metrics,
    # its F1 gate; knn_ivf, the partitioned-ANN scale path — round-5
    # rotation so every operator FAMILY has an externally-verified row).
    # Redundant oracle variants and locally-verified approximate ops
    # follow after position 50 (still checked by
    # tools/check_correctness.py and tests/).
    from . import exactlink

    q: dict[str, Callable[[str], Any]] = {
        # --- relational operator families (TPC-H-ish tables) ---
        "grouped_agg": relational.grouped_agg,
        "filter_project": relational.filter_project,
        "grouped_topk": relational.grouped_topk,
        "grouped_argmax": relational.grouped_argmax,
        "broadcast_join": relational.broadcast_join,
        "hash_join": relational.hash_join,
        "semi_join": relational.semi_join,
        "anti_join": relational.anti_join,
        "union_distinct": relational.union_distinct,
        "sort_limit": relational.sort_limit,
        "sorted_neighborhood_pairs": relational.sorted_neighborhood_pairs,
        "per_key_cap": relational.per_key_cap,
        "windowed_agg": relational.windowed_agg,
        "alias_table": relational.alias_table,
        "stratified_sample": relational.stratified_sample,
        "negative_sampling": relational.negative_sampling,
        "grouped_quantile": relational.grouped_quantile,
        "range_join": relational.range_join,
        "pivot_wide": relational.pivot_wide,
        "rollup_agg": relational.rollup_agg,
        # --- bounded event-time operators ---
        "sessionize": streamops.sessionize,
        "running_sum": streamops.running_sum,
        "asof_join": streamops.asof_join,
        # --- source formats beyond parquet (S1/S2) + nested model ---
        "jsonl_ingest": sourceops.jsonl_ingest,
        "csv_ingest": sourceops.csv_ingest,
        "nested_links": sourceops.nested_links,
        "hash_split": textops.doc_hash_split,
        # --- text analysis / dedup over documents ---
        "doc_exact_dedup": textops.doc_exact_dedup,
        "doc_token_count": textops.doc_token_count,
        "doc_tokens_bpe": tokenops.doc_tokens_bpe,
        "doc_lang_id": textops.doc_lang_id,
        "doc_heavy_hitter_words": textops.doc_heavy_hitter_words,
        "doc_quality_pct_filter": textops.doc_quality_pct_filter,
        "doc_tfidf_top_terms": textops.doc_tfidf_top_terms,
        "doc_quality_filter": textops.doc_quality_filter,
        "doc_length_histogram": textops.doc_length_histogram,
        # string-similarity join family's driver-verified row (the
        # entity-resolution tier's blocked score-verify shape; the
        # PassJoin edit-distance variant is local-checked past the window)
        "fuzzy_jw_join": fuzzyjoin.fuzzy_jw_join,
        # --- similarity search over embeddings (exact members) ---
        "knn_bruteforce": annops.knn_bruteforce,
        "knn_ivf": annops.knn_ivf,
        "knn_rerank": annops.knn_rerank,
        "knn_k_unique": annops.knn_k_unique,
        "emb_near_dupes": annops.emb_near_dupes,
        "emb_centroids": annops.emb_centroids,
        # --- the input_hint corpus: ingest + exact-blocking linkage ---
        "corpus_ingest": corpusops.corpus_ingest,
        "corpus_dup_groups": corpusops.corpus_dup_groups,
        "corpus_rename_counts": corpusops.corpus_rename_counts,
        "linkage_exact_pairs": exactlink.linkage_exact_pairs,
        "linkage_exact_clusters": exactlink.linkage_exact_clusters,
        # --- the LSH flagship (rows-only driver checks: LSH banding and
        # iterative CC are not SQL-expressible; tests/ carry oracles) ---
        "linkage_clusters": corpusops.linkage_clusters,
        "linkage_f1_metrics": corpusops.linkage_f1_metrics,
        # ================= position > 50: outside the driver window ====
        "mean_agg": relational.mean_agg,
        "distinct_count": relational.distinct_count,
        "event_type_distribution": relational.event_type_distribution,
        "first_n_distinct": relational.first_n_distinct,
        "doc_mention_context_cut": tokenops.doc_mention_context_cut,
        "doc_embed_tokens": tokenops.doc_embed_tokens,
        "skew_join": relational.skew_join,
        "grouped_corr": relational.grouped_corr,
        "ranked_per_key": relational.ranked_per_key,
        "left_outer_join": relational.left_outer_join,
        "doc_pmi_bigrams": textops.doc_pmi_bigrams,
        "doc_decontaminate": textops.doc_decontaminate,
        "grouped_mode": relational.grouped_mode,
        "ntile_per_key": relational.ntile_per_key,
        "grouped_concat": relational.grouped_concat,
        "grouped_zscore": relational.grouped_zscore,
        "unique_batcher": relational.unique_batcher,
        "grouped_stats": relational.grouped_stats,
        "bloom_semi_join": relational.bloom_semi_join,
        "token_pack": textops.token_pack,
        "doc_dup_ngram_fraction": textops.doc_dup_ngram_fraction,
        "weighted_sample": relational.weighted_sample,
        "corpus_boilerplate_lines": corpusops.corpus_boilerplate_lines,
        "linkage_scored_pairs": corpusops.linkage_scored_pairs,
        "blocking_quality": corpusops.blocking_quality,
        "cluster_reps": corpusops.cluster_reps,
        "cluster_size_hist": corpusops.cluster_size_hist,
        "fs_weights": corpusops.fs_weights,
        "knn_lsh": annops.knn_lsh,
        "knn_ivf_capped": lambda sf: annops.knn_ivf(sf, max_per_label=20),
        "knn_quantized": annops.knn_quantized,
        "knn_ivf_quantized": annops.knn_ivf_quantized,
        "knn_ivf_pq": annops.knn_ivf_pq,
        "knn_capped": lambda sf: annops.knn_bruteforce(sf, max_per_label=20),
        "emb_near_dupes_lsh": annops.emb_near_dupes_lsh,
        "semantic_dedup": annops.semantic_dedup,
        "linkage_incremental": corpusops.linkage_incremental,
        "sliding_window_counts": streamops.sliding_window_counts,
        "topk_global": relational.topk_global,
        "intersect_distinct": relational.intersect_distinct,
        "except_distinct": relational.except_distinct,
        "global_shuffle": textops.doc_global_shuffle,
        "shuffled_cap": textops.doc_shuffled_cap,
        "doc_quality": textops.doc_quality,
        "doc_bpe_token_count": textops.doc_bpe_token_count,
        "doc_md5_fingerprint": textops.doc_md5_fingerprint,
        "doc_winnow_fingerprint": textops.doc_winnow_fingerprint,
        "doc_simhash": textops.doc_simhash,
        "doc_simhash_pairs": textops.doc_simhash_pairs,
        "doc_ngram_jaccard_pairs": textops.doc_ngram_jaccard_pairs,
        "doc_minhash_lsh_pairs": textops.doc_minhash_lsh_pairs,
        "doc_dedup_keep": textops.doc_dedup_keep,
        "fuzzy_lev_join": fuzzyjoin.fuzzy_lev_join,
        "doc_mask_stopwords": textops.doc_mask_stopwords,
        "full_outer_join": relational.full_outer_join,
        "grouped_entropy": relational.grouped_entropy,
        "approx_distinct_count": relational.approx_distinct_count,
        "approx_quantile": relational.approx_quantile,
        "media_features": _media_features,
        "media_real_features": _media_real_features,
        "media_resize": _media_resize,
        "media_frame_sample": _media_frame_sample,
        "media_spectrogram": _media_spectrogram,
        "media_shot_detect": _media_shot_detect,
    }
    return q


def _media_features(sf_dir: str):
    """multimodal plumbing: synthetic binary media table -> actor-pool
    feature extraction (fake decoder for hash stability; media_real_features drives the real codecs)."""
    from .stages.multimodal import extract_media_features, synth_media_dataset

    out = extract_media_features(synth_media_dataset(64))
    import pyarrow as pa

    return out.map_batches(
        lambda t: t.select(
            ["media_id", "kind", "width", "height", "sample_rate", "payload_len"]
        ),
        batch_format="pyarrow",
    )


def _media_real_features(sf_dir: str):
    """the all-REAL codec path end to end: BMP images, WAV audio and
    uncompressed-DIB AVI video are actually decoded (pure-NumPy codecs,
    functions/codecs.py) before feature extraction — no fake decode
    anywhere in this query."""
    from .stages.multimodal import extract_media_features, synth_media_dataset

    out = extract_media_features(
        synth_media_dataset(64, real_codecs=True), decoder="real"
    )
    return out.map_batches(
        lambda t: t.select(
            ["media_id", "kind", "width", "height", "sample_rate", "payload_len"]
        ),
        batch_format="pyarrow",
    )


def _media_resize(sf_dir: str):
    """multimodal resize stage (fake decoder for hash stability; the real BMP path is tested in tests/test_ops.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.multimodal import resize_media, synth_media_dataset

    out = resize_media(synth_media_dataset(64))
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "width": t["width"],
                "height": t["height"],
                "payload_len": pc.cast(pc.binary_length(t["payload"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _media_frame_sample(sf_dir: str):
    """multimodal frame-sampling stage (fake chunk demux for hash stability; the real AVI demux path is tested in tests/test_ops.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.multimodal import sample_frames, synth_media_dataset

    out = sample_frames(synth_media_dataset(64))
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "frame_index": pc.cast(t["frame_index"], pa.int64()),
                "frame_len": pc.cast(pc.binary_length(t["frame"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _lang_id_sql() -> str:
    """CASE expression mirroring functions.textstats.lang_id exactly."""
    script_cases = "\n".join(
        f"      WHEN regexp_matches(text, '{pat}') THEN '{code}'" for code, pat in _SCRIPT_RES
    )
    # marker argmax with first-max-wins tie-break == chained >= comparisons
    counts = {
        code: f"length(regexp_extract_all(text, '{pat}'))" for code, pat in _MARKER_RES
    }
    es, de, fr = counts["es"], counts["de"], counts["fr"]
    return f"""
    SELECT doc_id,
      CASE
{script_cases}
      WHEN {es} = 0 AND {de} = 0 AND {fr} = 0 THEN 'en'
      WHEN {es} >= {de} AND {es} >= {fr} THEN 'es'
      WHEN {de} >= {fr} THEN 'de'
      ELSE 'fr'
      END AS pred_lang
    FROM documents
    """


def _exact_link_sql(files: str, clusters: bool) -> str:
    """The exact-blocking linkage (mel_ray/exactlink.py) in ANSI SQL:
    normalized non-empty lines -> consecutive 2-line shingles ->
    df-bounded inverted-index blocking -> exact shingle-set Jaccard ->
    (clusters=True) connected components by recursive transitive
    closure, cluster id = min uid."""
    base = f"""
        WITH RECURSIVE recs AS (
          SELECT repo || chr(1) || path || chr(1) || "commit" AS uid,
                 list_filter(list_transform(string_split(content, chr(10)),
                                            x -> trim(x, ' ' || chr(9))),
                             x -> x <> '') AS l
          FROM {files}),
        sh AS (
          SELECT DISTINCT uid, s FROM (
            SELECT uid, unnest(list_transform(range(1, greatest(len(l), 1)),
                                              i -> l[i] || chr(3) || l[i+1])) AS s
            FROM recs)),
        nsh AS (SELECT uid, count(*) AS n FROM sh GROUP BY 1),
        df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        blocked AS (SELECT s FROM df WHERE df BETWEEN 2 AND 10),
        cand AS (
          SELECT DISTINCT a.uid AS id_a, b.uid AS id_b
          FROM sh a JOIN blocked USING (s) JOIN sh b USING (s)
          WHERE a.uid < b.uid),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS m
          FROM cand c
          JOIN sh sa ON sa.uid = c.id_a
          JOIN sh sb ON sb.uid = c.id_b AND sb.s = sa.s
          GROUP BY 1, 2),
        scored AS (
          SELECT id_a, id_b, m,
                 m * 1.0 / (na.n + nb.n - m) AS j
          FROM inter JOIN nsh na ON na.uid = id_a
                     JOIN nsh nb ON nb.uid = id_b)
    """
    if not clusters:
        return base + """
        SELECT id_a, id_b, round(j, 4) AS jaccard, j >= 0.45 AS accepted
        FROM scored
        """
    return base + """
        , edges AS (SELECT id_a, id_b FROM scored WHERE j >= 0.45),
        sym AS (SELECT id_a AS a, id_b AS b FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        reach AS (
          SELECT uid AS node, uid AS r FROM recs
          UNION
          SELECT s.a, re.r FROM sym s JOIN reach re ON re.node = s.b)
        SELECT node AS uid, min(r) AS cluster_id FROM reach GROUP BY 1
        """


def oracle_sql() -> dict[str, str]:
    # The corpus-query oracles read the synthetic corpus parquet directly;
    # make sure it exists even if the driver runs the SQL before the Ray
    # queries (generation is pure NumPy — no Ray session needed).
    try:
        from .synth import ensure_corpus

        ensure_corpus("/root/testdata/sf0.01")
    except Exception:
        pass  # SQL strings themselves remain valid
    try:
        from . import sourceops as _so

        _so.ensure_jsonl_export("/root/testdata/sf0.01")
        _so.ensure_tsv_export("/root/testdata/sf0.01")
        _so.ensure_nested_export("/root/testdata/sf0.01")
    except Exception:
        pass
    files = f"read_parquet('{_CORPUS_SF001}/files/*.parquet')"
    renames = f"read_parquet('{_CORPUS_SF001}/repo_renames.parquet')"
    tok = TOKEN_RE
    return {
        "grouped_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   count(*) AS n_rows
            FROM lineitem GROUP BY 1, 2
        """,
        "filter_project": """
            SELECT l_returnflag,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem WHERE l_shipdate < '1996-01-01' GROUP BY 1
        """,
        "grouped_topk": """
            SELECT p_brand, p_partkey, p_retailprice FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
              FROM part) WHERE rn <= 3
        """,
        "grouped_argmax": """
            SELECT c_nationkey, c_custkey, c_acctbal FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer) WHERE rn = 1
        """,
        "broadcast_join": """
            SELECT p.p_brand,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        """,
        "hash_join": """
            SELECT o.o_orderpriority, count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "skew_join": """
            SELECT s_nationkey, count(*) AS n_items,
                   round(sum(l_extendedprice), 2) AS revenue
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1
        """,
        "grouped_corr": """
            -- same float64 expression tree as the Ray finalizer
            -- (co-moment sums -> cov / sqrt(vx*vy)), rounded to 6 dp on
            -- both sides because partial sums of 2-dp prices are not
            -- exactly representable in float64
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   round(
                     (sum(l_quantity * l_extendedprice) / count(*)
                        - (sum(l_quantity) / count(*)) * (sum(l_extendedprice) / count(*)))
                     / sqrt(
                        (sum(l_quantity * l_quantity) / count(*)
                           - (sum(l_quantity) / count(*)) * (sum(l_quantity) / count(*)))
                        * (sum(l_extendedprice * l_extendedprice) / count(*)
                           - (sum(l_extendedprice) / count(*)) * (sum(l_extendedprice) / count(*)))),
                     6) AS corr_qty_price
            FROM lineitem GROUP BY 1
        """,
        "ranked_per_key": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER w AS rn,
                   lag(o_totalprice) OVER w AS prev_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "left_outer_join": """
            SELECT c_custkey, c_nationkey,
                   coalesce(o.n_orders, 0) AS n_orders
            FROM customer
            LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
                       FROM orders GROUP BY 1) o
              ON c_custkey = o.o_custkey
        """,
        "doc_pmi_bigrams": f"""
            WITH docs AS (
              SELECT regexp_extract_all(text, '{TOKEN_RE}') AS ws FROM documents),
            uni AS (
              SELECT u.w AS w, count(*) AS c
              FROM docs, unnest(ws) AS u(w) GROUP BY 1),
            big AS (
              SELECT u.p[1] AS w1, u.p[2] AS w2, count(*) AS n_pairs
              FROM docs, unnest(list_zip(ws, ws[2:])) AS u(p)
              WHERE u.p[2] IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT (SELECT sum(c)::DOUBLE FROM uni) AS nn,
                           (SELECT sum(n_pairs)::DOUBLE FROM big) AS mm)
            SELECT w1, w2, n_pairs,
                   round(ln((n_pairs / mm)
                            / ((c1.c / nn) * (c2.c / nn))), 6) AS pmi
            FROM big
            JOIN uni c1 ON big.w1 = c1.w
            JOIN uni c2 ON big.w2 = c2.w
            CROSS JOIN tot
            WHERE n_pairs >= 5
        """,
        "doc_decontaminate": f"""
            WITH bench AS (
              SELECT DISTINCT u.p[1] || ' ' || u.p[2] || ' ' || u.p[3] AS g
              FROM (SELECT regexp_extract_all(text, '{TOKEN_RE}') AS ws
                    FROM documents WHERE doc_id % 97 = 0) d,
                   unnest(list_zip(ws, ws[2:], ws[3:])) AS u(p)
              WHERE u.p[3] IS NOT NULL),
            probe AS (
              SELECT doc_id, u.p[1] || ' ' || u.p[2] || ' ' || u.p[3] AS g
              FROM (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS ws
                    FROM documents WHERE doc_id % 97 <> 0) d,
                   unnest(list_zip(ws, ws[2:], ws[3:])) AS u(p)
              WHERE u.p[3] IS NOT NULL)
            SELECT p.doc_id, count(*) AS n_hits
            FROM probe p JOIN bench b ON p.g = b.g
            GROUP BY 1
        """,
        "grouped_mode": """
            SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n_occurrences
            FROM (
              SELECT l_returnflag, l_quantity, count(*) AS cnt,
                     row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY count(*) DESC, l_quantity ASC) AS rn
              FROM lineitem GROUP BY 1, 2)
            WHERE rn = 1
        """,
        "ntile_per_key": """
            SELECT l_returnflag, tile, count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM (SELECT l_returnflag, l_quantity,
                    ntile(4) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity, l_orderkey, l_linenumber) AS tile
                  FROM lineitem)
            GROUP BY 1, 2
        """,
        "grouped_concat": """
            SELECT c_nationkey,
                   string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
                   count(DISTINCT c_mktsegment) AS n_segments
            FROM customer GROUP BY 1
        """,
        "grouped_zscore": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   round((l_extendedprice - s/n) / sqrt(ss/n - (s/n)*(s/n)), 4) AS z
            FROM (SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
                    sum(l_extendedprice) OVER (PARTITION BY l_returnflag) AS s,
                    sum(l_extendedprice*l_extendedprice) OVER (PARTITION BY l_returnflag) AS ss,
                    CAST(count(*) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS n
                  FROM lineitem)
        """,
        "pivot_wide": """
            SELECT user_id,
              round(sum(CASE WHEN event_type='click' THEN value ELSE 0 END),2) AS click_sum,
              round(sum(CASE WHEN event_type='error' THEN value ELSE 0 END),2) AS error_sum,
              round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END),2) AS purchase_sum,
              round(sum(CASE WHEN event_type='signup' THEN value ELSE 0 END),2) AS signup_sum,
              round(sum(CASE WHEN event_type='view' THEN value ELSE 0 END),2) AS view_sum
            FROM events GROUP BY user_id
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        """,
        "bloom_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
        """,
        "intersect_distinct": """
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        """,
        "except_distinct": """
            SELECT DISTINCT l_partkey AS partkey FROM lineitem
            EXCEPT
            SELECT DISTINCT p_partkey AS partkey FROM part
            WHERE p_retailprice >= 1500.0
        """,
        "union_distinct": """
            SELECT nationkey, count(*) AS n_refs FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL
              SELECT s_nationkey AS nationkey FROM supplier)
            GROUP BY 1
        """,
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "topk_global": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "sorted_neighborhood_pairs": """
            WITH ranked AS (
              SELECT c_custkey,
                     row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
              FROM customer)
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   CAST(b.rn - a.rn AS BIGINT) AS dist
            FROM ranked a JOIN ranked b
              ON b.rn > a.rn AND b.rn <= a.rn + 4
        """,
        "per_key_cap": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM (
              SELECT l_orderkey, l_linenumber, l_quantity,
                     row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber ASC, l_quantity ASC) AS rn
              FROM lineitem) WHERE rn <= 2
        """,
        "distinct_count": """
            SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
            FROM orders GROUP BY 1
        """,
        "mean_agg": """
            SELECT l_returnflag, round(avg(l_quantity), 4) AS avg_qty
            FROM lineitem GROUP BY 1
        """,
        "grouped_stats": """
            -- variance spelled as the same float64 expression tree the
            -- Ray finalizer uses (ss/n - (s/n)^2 over exact integer
            -- sums), so values match bit-for-bit without rounding
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   sum(l_quantity) / count(*) AS mean_qty,
                   sum(l_quantity * l_quantity) / count(*)
                     - (sum(l_quantity) / count(*)) * (sum(l_quantity) / count(*))
                     AS var_qty,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1
        """,
        "windowed_agg": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "alias_table": """
            SELECT user_id, event_type, n FROM (
              SELECT user_id, event_type, count(*) AS n,
                     row_number() OVER (PARTITION BY user_id
                        ORDER BY count(*) DESC, event_type ASC) AS rn
              FROM events GROUP BY user_id, event_type)
            WHERE rn <= 2
        """,
        "event_type_distribution": """
            SELECT event_type, count(*) AS n,
                   round(count(*) * 1.0 / (SELECT count(*) FROM events), 6) AS share
            FROM events GROUP BY 1
        """,
        "first_n_distinct": """
            SELECT user_id, event_type, first_ts FROM (
              SELECT user_id, event_type, first_ts,
                     row_number() OVER (PARTITION BY user_id
                        ORDER BY first_ts ASC, event_type ASC) AS rn
              FROM (SELECT user_id, event_type, min(ts) AS first_ts
                    FROM events GROUP BY 1, 2))
            WHERE rn <= 3
        """,
        "jsonl_ingest": f"""
            SELECT doc_id, lang, sha256(text) AS text_sha,
                   length(text) AS n_chars
            FROM read_json_auto('{_SOURCES_SF001}/jsonl/gz/*.jsonl.gz')
        """,
        "csv_ingest": f"""
            SELECT event_type, count(*) AS n_rows,
                   round(sum(value), 2) AS sum_value
            FROM read_csv('{_SOURCES_SF001}/tsv/*.tsv', delim='\t', header=true)
            GROUP BY 1
        """,
        "nested_links": f"""
            SELECT doc_id, u.target AS target, u.weight AS weight
            FROM (SELECT doc_id, unnest(links) AS u
                  FROM read_parquet('{_SOURCES_SF001}/nested/docs_nested.parquet'))
        """,
        "global_shuffle": """
            SELECT doc_id, n_chars FROM documents
        """,
        "hash_split": """
            SELECT doc_id, n_chars FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 4 = 1
        """,
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts,
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM o)
            SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start
            FROM s GROUP BY 1, 2
        """,
        "running_sum": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), 2) AS running_value
            FROM events
        """,
        "sliding_window_counts": """
            SELECT event_type,
                   make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000)
                     AS window_start,
                   count(*) AS n_events
            FROM events, range(0, 2) t(i)
            GROUP BY 1, 2
        """,
        "asof_join": """
            WITH c AS (
              SELECT user_id, ts, max(event_id) AS last_click_id
              FROM events WHERE event_type = 'click' GROUP BY 1, 2),
            p AS (
              SELECT event_id, user_id, ts
              FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id, p.ts,
                   c.last_click_id, c.ts AS last_click_ts
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "grouped_quantile": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 4) AS q50,
                   round(quantile_cont(l_quantity, 0.95), 4) AS q95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "range_join": """
            WITH bands AS (
              SELECT CAST(b AS BIGINT) AS band_id,
                     b * 5000.0 AS lo, b * 5000.0 + 15000.0 AS hi
              FROM range(0, 100) t(b))
            SELECT band_id, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band_id ORDER BY band_id
        """,
        "stratified_sample": """
            SELECT event_id, event_type FROM (
              SELECT event_id, event_type,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
              FROM events) WHERE rn <= 20
        """,
        "unique_batcher": """
            SELECT event_id, event_type,
                   CAST(row_number() OVER (
                          PARTITION BY event_type
                          ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
                        - 1 AS BIGINT) AS batch_id
            FROM events
        """,
        "negative_sampling": """
            WITH types AS (SELECT DISTINCT event_type FROM events),
            cand AS (
              SELECT e.event_id, t.event_type AS neg_type,
                     md5(CAST(e.event_id AS VARCHAR) || ':' || t.event_type) AS h
              FROM events e JOIN types t ON t.event_type <> e.event_type)
            SELECT event_id, neg_type, CAST(rn AS BIGINT) AS neg_rank FROM (
              SELECT *, row_number() OVER (PARTITION BY event_id
                         ORDER BY h ASC, neg_type ASC) AS rn
              FROM cand) WHERE rn <= 2
        """,
        "doc_mask_stopwords": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(the|and|of|to|in|a)\b', '<MASK>', 'g')
                     AS masked_text,
                   CAST(length(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                        AS BIGINT) AS n_masked
            FROM documents
        """,
        "doc_exact_dedup": """
            SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha
            FROM documents GROUP BY text
        """,
        "doc_token_count": f"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '{tok}')) AS n_tokens
            FROM documents
        """,
        # BPE merges are not SQL-expressible; the oracle is the
        # checked-in golden token table (the reference pins tokenizer
        # output the same way — tests/tokenization/pipeline/
        # test_pipeline.py:71-89).  The join on (doc_id, md5(text))
        # makes the golden content-addressed: each scale dir selects
        # exactly its own rows.  Independent verification of the
        # tokenizer itself is in tests/test_tokenize.py.
        "doc_tokens_bpe": """
            SELECT g.doc_id, g.pos, g.token_id
            FROM read_parquet('/root/repo/mel_ray/data/golden_doc_tokens.parquet') g
            JOIN documents d ON g.doc_id = d.doc_id AND g.text_md5 = md5(d.text)
        """,
        "doc_mention_context_cut": """
            SELECT g.doc_id, g.pos, g.token_id
            FROM read_parquet('/root/repo/mel_ray/data/golden_mention_cut.parquet') g
            JOIN documents d ON g.doc_id = d.doc_id AND g.text_md5 = md5(d.text)
        """,
        "weighted_sample": """
            SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice,
                     round(-ln(md5_number_lower(CAST(o_orderkey AS VARCHAR))
                               / 18446744073709551616.0)
                           / o_totalprice, 12) AS r
              FROM orders)
            ORDER BY r, o_orderkey LIMIT 50
        """,
        "token_pack": f"""
            SELECT doc_id, n_tokens,
                   CAST((cum - n_tokens) // 4096 AS BIGINT) AS batch_id
            FROM (SELECT doc_id,
                         CAST(length(regexp_extract_all(text, '{tok}')) AS BIGINT)
                           AS n_tokens,
                         SUM(length(regexp_extract_all(text, '{tok}')))
                           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                  FROM documents)
        """,
        "doc_bpe_token_count": f"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '{tok}')) AS n_words,
                   round(length(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                         / greatest(length(text), 1), 4) AS alpha_ratio,
                   round(length(regexp_extract_all(text, '[A-Z]')) * 1.0
                         / greatest(length(text), 1), 4) AS upper_ratio,
                   round(length(regexp_extract_all(text, '[0-9]')) * 1.0
                         / greatest(length(text), 1), 4) AS digit_ratio,
                   round(length(regexp_extract_all(text, '[ \t\n]')) * 1.0
                         / greatest(length(text), 1), 4) AS space_ratio,
                   round(length(regexp_extract_all(text, '[^A-Za-z0-9 \t\n]')) * 1.0
                         / greatest(length(text), 1), 4) AS punct_ratio
            FROM documents
        """,
        "doc_lang_id": _lang_id_sql(),
        "doc_dup_ngram_fraction": f"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(text, '{tok}') AS ws
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest([array_to_string(ws[i:i+4], ' ')
                                 for i in range(1, len(ws) - 3)]) AS gram
                  FROM w),
            d AS (SELECT doc_id, count(*) AS n_grams,
                         round(1.0 - count(DISTINCT gram) * 1.0 / count(*), 6)
                           AS dup_frac
                  FROM g GROUP BY 1)
            SELECT w.doc_id, coalesce(d.n_grams, 0) AS n_grams,
                   coalesce(d.dup_frac, 0.0) AS dup_frac
            FROM w LEFT JOIN d USING (doc_id)
        """,
        "doc_heavy_hitter_words": f"""
            WITH words AS (
              SELECT unnest(regexp_extract_all(text, '{tok}')) AS word
              FROM documents)
            SELECT word, count(*) AS n_occurrences
            FROM words GROUP BY word
            HAVING count(*) * 100 > (SELECT count(*) FROM words)
        """,
        "doc_quality_pct_filter": """
            WITH q AS (
              SELECT doc_id,
                     round(length(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                           / greatest(length(text), 1), 4) AS alpha4
              FROM documents),
            t AS (SELECT quantile_cont(alpha4, 0.2) AS thr FROM q)
            SELECT doc_id, alpha4 FROM q, t WHERE alpha4 >= thr
        """,
        "doc_tfidf_top_terms": f"""
            WITH words AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS word
              FROM documents),
            tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
            df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS nn FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.word, tf.tf * ln(nn / df) AS s
              FROM tf JOIN df USING (word) CROSS JOIN n)
            SELECT doc_id, word AS term, round(s, 4) AS tfidf FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY s DESC, word ASC) AS rn
              FROM scored) WHERE rn <= 3
        """,
        "doc_md5_fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "doc_length_histogram": """
            SELECT (n_chars // 100) * 100 AS len_bucket, count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "doc_quality_filter": f"""
            SELECT doc_id, n_words,
                   round(alpha, 4) AS alpha_ratio,
                   round(digit, 4) AS digit_ratio
            FROM (
              SELECT doc_id,
                     length(regexp_extract_all(text, '{tok}')) AS n_words,
                     length(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                       / greatest(length(text), 1) AS alpha,
                     length(regexp_extract_all(text, '[0-9]')) * 1.0
                       / greatest(length(text), 1) AS digit
              FROM documents)
            WHERE n_words >= 5 AND alpha >= 0.5 AND digit <= 0.3
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       ORDER BY vec_id LIMIT 20),
            sims AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS s
              FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id)
            SELECT query_id, neighbor_id, round(s, 4) AS cos_sim FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY s DESC, neighbor_id ASC) AS rn
              FROM sims) WHERE rn <= 5
        """,
        "knn_capped": """
            WITH idx AS (
              SELECT vec_id, embedding FROM (
                SELECT vec_id, embedding,
                       row_number() OVER (PARTITION BY label
                          ORDER BY vec_id ASC) AS rn
                FROM embeddings) WHERE rn <= 20),
            q AS (SELECT vec_id, embedding FROM idx ORDER BY vec_id LIMIT 20),
            sims AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS s
              FROM q CROSS JOIN idx e WHERE q.vec_id <> e.vec_id)
            SELECT query_id, neighbor_id, round(s, 4) AS cos_sim FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY s DESC, neighbor_id ASC) AS rn
              FROM sims) WHERE rn <= 5
        """,
        "knn_k_unique": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       ORDER BY vec_id LIMIT 20),
            sims AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     CAST(e.label AS BIGINT) AS label,
                     round(list_cosine_similarity(q.embedding, e.embedding), 4) AS s
              FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id),
            ranked AS (
              SELECT *,
                     row_number() OVER (PARTITION BY query_id
                        ORDER BY s DESC, neighbor_id ASC) AS rnk,
                     row_number() OVER (PARTITION BY query_id, label
                        ORDER BY s DESC, neighbor_id ASC) AS lrnk
              FROM sims)
            SELECT query_id, label, neighbor_id, s AS cos_sim,
                   CAST(unique_rank AS BIGINT) AS unique_rank
            FROM (
              SELECT query_id, label, neighbor_id, s,
                     row_number() OVER (PARTITION BY query_id
                        ORDER BY rnk ASC) AS unique_rank
              FROM ranked WHERE lrnk = 1)
            WHERE unique_rank <= 3
        """,
        "knn_rerank": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       ORDER BY vec_id LIMIT 20),
            cand AS (
              SELECT query_id, neighbor_id, embedding FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       e.embedding,
                       row_number() OVER (PARTITION BY q.vec_id
                          ORDER BY list_inner_product(q.embedding, e.embedding) DESC,
                                   e.vec_id ASC) AS rn
                FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id)
              WHERE rn <= 50),
            rer AS (
              SELECT c.query_id, c.neighbor_id,
                     list_cosine_similarity(q.embedding, c.embedding) AS s
              FROM cand c JOIN q ON q.vec_id = c.query_id)
            SELECT query_id, neighbor_id, round(s, 4) AS cos_sim FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY s DESC, neighbor_id ASC) AS rn
              FROM rer) WHERE rn <= 10
        """,
        "emb_near_dupes": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "emb_centroids": """
            SELECT label, i AS dim_i, round(avg(embedding[i]), 4) AS avg_val
            FROM embeddings, range(1, 65) t(i)
            GROUP BY 1, 2
        """,
        "corpus_ingest": f"""
            SELECT repo, path, "commit", sha256(content) AS sha256,
                   strlen(content) AS content_len
            FROM {files}
        """,
        "corpus_dup_groups": f"""
            SELECT sha256(content) AS sha256, count(*) AS n_copies
            FROM {files} GROUP BY 1
        """,
        "corpus_rename_counts": f"""
            SELECT coalesce(r.new_repo, f.repo) AS repo, count(*) AS n_files
            FROM {files} f LEFT JOIN {renames} r ON f.repo = r.old_repo
            GROUP BY 1
        """,
        "corpus_boilerplate_lines": f"""
            WITH l AS (SELECT repo || '/' || path || '@' || "commit" AS fid,
                              unnest(string_split(content, chr(10))) AS line
                       FROM {files})
            SELECT line, count(*) AS n_occurrences,
                   count(DISTINCT fid) AS n_files
            FROM l WHERE line <> ''
            GROUP BY 1 HAVING count(DISTINCT fid) >= 3
        """,
        "linkage_exact_pairs": _exact_link_sql(files, clusters=False),
        "linkage_exact_clusters": _exact_link_sql(files, clusters=True),
        # string-similarity join: the Ray side uses PassJoin pigeonhole
        # blocking + Myers verify; the oracle is the quadratic definition
        # (length-windowed so DuckDB finishes at sf0.01)
        "fuzzy_lev_join": f"""
            WITH p AS (SELECT DISTINCT path FROM {files}
                       WHERE length(path) >= 38)
            SELECT a.path AS path_a, b.path AS path_b,
                   levenshtein(a.path, b.path) AS dist
            FROM p a JOIN p b
              ON a.path < b.path
             AND length(b.path) BETWEEN length(a.path) - 2
                                    AND length(a.path) + 2
            WHERE levenshtein(a.path, b.path) <= 2
        """,
        # Jaro-Winkler similarity join: the kernel runs in DuckDB-parity
        # mode (boost gated at jaro > 0.7, strcmp95 floored transposition
        # count, float64), so the jw column is bit-exact vs the oracle
        "fuzzy_jw_join": """
            WITH p AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   jaro_winkler_similarity(a.p_name, b.p_name) AS jw
            FROM p a JOIN p b
              ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
             AND a.p_name < b.p_name
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
        """,
        "full_outer_join": """
            SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
                   c.c_acctbal AS acctbal,
                   coalesce(o.n_urgent, 0) AS n_urgent
            FROM (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_acctbal < 0) c
            FULL OUTER JOIN
                 (SELECT o_custkey, count(*) AS n_urgent FROM orders
                  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey
        """,
        "grouped_entropy": """
            SELECT user_id, entropy(event_type) AS ent
            FROM events GROUP BY user_id
        """,
        # linkage_clusters / linkage_scored_pairs / linkage_f1_metrics /
        # cluster_size_hist / cluster_reps / doc_winnow_fingerprint /
        # doc_simhash / doc_minhash_lsh_pairs / knn_lsh / knn_ivf_capped /
        # knn_k_unique are intentionally absent: non-SQL-expressible (LSH
        # banding, iterative union-find, hashed-ngram embeddings, adaptive
        # retrieval loops); the driver records rows-only checks and tests/
        # carries naive-Python oracles for each.
    }


def _media_spectrogram(sf_dir: str):
    """REAL audio analysis end to end: WAV decode + Hann-windowed rfft
    -> banded log power summary per clip (stages/multimodal.py
    AudioSpectrogram; no fake decode anywhere in this query)."""
    from .stages.multimodal import audio_spectrogram, synth_media_dataset

    out = audio_spectrogram(synth_media_dataset(64, real_codecs=True))

    def scalarize(t):
        # driver results must be sortable: summarize the band vector
        import numpy as np
        import pyarrow as pa

        bands = np.stack(t["band_energy"].to_pandas().to_numpy())
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_frames": t["n_frames"],
                "duration_sec": t["duration_sec"],
                "peak_band": pa.array(np.argmax(bands, axis=1).astype(np.int64)),
                "total_energy": pa.array(np.round(bands.sum(axis=1), 6)),
            }
        )

    return out.map_batches(scalarize, batch_format="pyarrow")


def _media_shot_detect(sf_dir: str):
    """REAL video analysis end to end: AVI demux + frame decode ->
    mean-luma-difference shot boundaries per clip (stages/multimodal.py
    ShotDetector)."""
    from .stages.multimodal import detect_shots, synth_media_dataset

    return detect_shots(synth_media_dataset(64, real_codecs=True))
