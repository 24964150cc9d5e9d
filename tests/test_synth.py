"""Corpus generator invariants (FIXTURES.md F1-F3, SURVEY.md §5 style)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from mel_ray.functions.minhash import exact_jaccard
from mel_ray.functions.shingles import line_shingles
from mel_ray.synth import generate_corpus


def test_deterministic_and_labeled(tmp_path, tiny_corpus):
    # same seed => byte-identical parquet content (schema + values)
    again = generate_corpus(tmp_path / "again", 800)
    t1 = pq.read_table(tiny_corpus / "files")
    t2 = pq.read_table(again / "files")
    assert t1.equals(t2)

    files = t1
    labels = pq.read_table(tiny_corpus / "labels.parquet")
    assert files.num_rows == 800 == labels.num_rows
    assert files.column_names == ["repo", "path", "commit", "lang", "content"]
    # record ids are the engine's deterministic fingerprints, all distinct
    from mel_ray.stages.ingest import record_fingerprint

    rid = record_fingerprint(files["repo"], files["path"], files["commit"])
    assert rid.tolist() == labels["record_id"].to_numpy().tolist()
    assert len(set(rid.tolist())) == 800


def test_labeled_pairs_are_separable(tiny_corpus):
    """Positives and negatives at shared blocking keys are Jaccard-separable
    (the precondition for the F1 >= 0.99 gate)."""
    files = pq.read_table(tiny_corpus / "files")
    pairs = pq.read_table(tiny_corpus / "labeled_pairs.parquet").to_pandas()
    assert (pairs.id_a < pairs.id_b).all()
    assert not pairs.duplicated(["id_a", "id_b"]).any()
    v, off = line_shingles(files["content"].combine_chunks())
    labels = pq.read_table(tiny_corpus / "labels.parquet").to_pandas()
    row_of = {rid: i for i, rid in enumerate(labels.record_id)}
    pos = pairs[pairs.is_match]
    neg = pairs[~pairs.is_match]
    assert len(pos) > 100 and len(neg) > 10
    jp = np.array(
        [exact_jaccard(v, off, row_of[a], row_of[b]) for a, b in zip(pos.id_a, pos.id_b)]
    )
    jn = np.array(
        [exact_jaccard(v, off, row_of[a], row_of[b]) for a, b in zip(neg.id_a, neg.id_b)]
    )
    assert jp.min() > 0.45
    assert jn.max() < 0.45
