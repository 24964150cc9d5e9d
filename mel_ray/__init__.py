"""mel_ray — a Ray-Data-native record-linkage / data-processing engine.

From-scratch recast of the reference system (Yokto13/mel — multilingual
bi-encoder entity linking; see SURVEY.md) as an idiomatic Ray Data
pipeline over a Parquet corpus of source-code files:

    blocking  (MinHash-LSH band keys over shingled content;
               alias-table analogue: src/baselines/string_alias_tables)
    scoring   (actor-pool bi-encoder embeddings + batched cosine +
               Jaro-Winkler / Levenshtein on path & repo;
               analogue: src/utils/embeddings.py:55-175,
               src/models/searchers/brute_force_searcher.py:28-36)
    clustering (distributed min-label-propagation connected components;
               recast of recall@k evaluation into transitive linkage,
               src/models/recall_calculator.py:43-66)

Everything streams through ``ray.data.Dataset`` with zero-copy Arrow
batches; stateful stages are actor pools; wide steps are explicit
bucketed shuffles.  No code is copied from the reference.
"""

__version__ = "0.1.0"
