"""Source-format operators: codec-sniffing JSONL reader, TSV, nested
explode, global shuffle (reference §5 pattern: naive readers validate
the distributed ones; Mixer's multiset-conservation invariant)."""

from __future__ import annotations

import bz2
import gzip
import json
import lzma

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestJsonlSource:
    def test_mixed_codec_dir_equals_gz_dir(self):
        """The mixed dir holds the same rows as the gz dir but spread
        over xz / bz2 / plain / gz shards (the reference's part-* codec
        variety, damuel.py:28-61) — the reader must see identical data."""
        from mel_ray.sourceops import JSONL_SCHEMA, ensure_jsonl_export
        from mel_ray.sources.jsonl import read_jsonl_dir

        root = ensure_jsonl_export(SF)
        gz = read_jsonl_dir(str(root / "gz"), schema=JSONL_SCHEMA).to_pandas()
        mixed = read_jsonl_dir(str(root / "mixed"), schema=JSONL_SCHEMA).to_pandas()
        gz = gz.sort_values("doc_id").reset_index(drop=True)
        mixed = mixed.sort_values("doc_id").reset_index(drop=True)
        assert gz.equals(mixed)
        assert len(gz) > 0

    def test_codec_sniffing(self):
        from mel_ray.sources.jsonl import _decompress_auto

        payload = b'{"a": 1}\n'
        assert _decompress_auto(gzip.compress(payload)) == payload
        assert _decompress_auto(bz2.compress(payload)) == payload
        assert _decompress_auto(lzma.compress(payload)) == payload
        assert _decompress_auto(payload) == payload

    def test_jsonl_matches_parquet_source(self):
        """Round-trip: the JSONL export must carry exactly the parquet
        rows (sha-per-row equality, the ingest invariant)."""
        import pyarrow.parquet as pq

        from mel_ray.sourceops import jsonl_ingest

        got = jsonl_ingest(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        import hashlib

        want["text_sha"] = [hashlib.sha256(t.encode()).hexdigest() for t in want.text]
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert (got.doc_id.to_numpy() == want.doc_id.to_numpy()).all()
        assert (got.text_sha.to_numpy() == want.text_sha.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
class TestShuffleAndNested:
    def test_global_shuffle_conserves_multiset_and_changes_order(self):
        """The Mixer invariant (test_mixer.py:34-66): row multiset is
        preserved; with 500 rows the identity permutation is
        astronomically unlikely, so order must differ."""
        import pyarrow.parquet as pq

        from mel_ray.textops import doc_global_shuffle

        got = doc_global_shuffle(SF).to_pandas()
        src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
        assert sorted(got.doc_id) == sorted(src.doc_id)
        assert (
            got.set_index("doc_id").n_chars.sort_index() == src.set_index("doc_id").n_chars.sort_index()
        ).all()
        assert list(got.doc_id) != list(src.doc_id)

    def test_shuffled_cap_is_valid_sample(self):
        import pyarrow.parquet as pq

        from mel_ray.textops import doc_shuffled_cap

        got = doc_shuffled_cap(SF, n=100).to_pandas()
        src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
        assert len(got) == 100
        assert set(got.doc_id) <= set(src.doc_id)
        assert got.doc_id.is_unique

    def test_nested_explode_matches_naive(self):
        import pyarrow.parquet as pq

        from mel_ray.sourceops import ensure_nested_export, nested_links

        got = nested_links(SF).to_pandas().sort_values(["doc_id", "target", "weight"])
        root = ensure_nested_export(SF)
        tbl = pq.read_table(root / "docs_nested.parquet").to_pandas()
        rows = [
            (r.doc_id, l["target"], l["weight"])
            for r in tbl.itertuples()
            for l in r.links
        ]
        want = sorted(rows)
        assert list(map(tuple, got.to_numpy())) == want
