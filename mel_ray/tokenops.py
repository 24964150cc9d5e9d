"""Tokenization query surface (M6/M7 real-BPE parity + M8/M9 recut).

Oracles: BPE merges are not SQL-expressible, so these ops are pinned
the way the reference pins its own tokenization — against a CHECKED-IN
token-id table (cf. tests/tokenization/pipeline/test_pipeline.py:71-89,
which asserts the (n, expected_size) int contract on stored output).
``tools/gen_token_golden.py`` writes one long-format golden parquet per
op spanning every testdata scale; the oracle SQL joins the golden to
the live ``documents`` view on ``(doc_id, md5(text))`` so each scale
self-selects its own rows — a content-addressed golden, not a
scale-pinned one.  Independent (non-circular) verification lives in
tests/test_tokenize.py: hand-computed merges, a brute-force reference
encoder, and width/mention-presence property tests.
"""

from __future__ import annotations

from .stages.tokenize import cut_mention_documents, tokenize_documents
from .util import read_parquet_clean


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def doc_tokens_bpe(sf_dir: str):
    """Fixed-width (64) BPE token ids per document, long format
    (doc_id, pos, token_id) — M6/M7: TokenizerWrapper's
    ``padding="max_length", truncation=True`` contract
    (tokenizer_wrapper.py:6-15) over the checked-in vocab."""
    return tokenize_documents(_docs(sf_dir, ["doc_id", "text"]))


def doc_mention_context_cut(sf_dir: str):
    """Budget-aware mention+context recut (M8/M9, tokens_cutter.py:33-163
    semantics): the middle word of each document is bracketed by [M]
    deterministically, then cut so mention + context fill exactly 64
    slots, long format (doc_id, pos, token_id)."""
    return cut_mention_documents(_docs(sf_dir, ["doc_id", "text"]))


def doc_embed_tokens(sf_dir: str):
    """tokenize -> encoder actor pool -> (doc_id, emb[64]) — the T1/T2
    model-inference dataflow (embed_links_for_generation recast) with
    the shipped deterministic bag encoder; swap a real transformer by
    EncoderSpec(factory=<dotted path>).  No SQL oracle (model scoring);
    determinism + plug-point behavior verified in tests/test_tokenize.py."""
    from .stages.embed import embed_documents

    return embed_documents(_docs(sf_dir, ["doc_id", "text"]))
