"""Real-BPE tokenizer (M6/M7) + token-budget recut (M8/M9).

Independent (non-golden) verification: hand-computed merges on a micro
corpus, a brute-force reference encoder (merges applied globally in
rank order — the textbook formulation, a DIFFERENT algorithm from the
rank-greedy production loop), the fixed-width TokenizerWrapper contract,
and cutter properties (width always expected_size, mention tokens always
present, each cut branch exercised).  The checked-in golden parquets
used by the driver oracle are cross-checked against a recomputation so
artifact drift fails here first.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from mel_ray.functions.bpe import (
    CLS,
    MENTION,
    PAD,
    SEP,
    SPECIALS,
    UNK,
    BPETokenizer,
    train_bpe,
)
from mel_ray.functions.tokens_cut import cut_mention_with_context, token_mention_span
from mel_ray.stages.tokenize import DEFAULT_VOCAB, CutMentions

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_train_bpe_hand_computed_merges():
    # corpus: "low" x5, "lower" x2 -> pair counts over
    # {l,o,w</w>} x5 and {l,o,w,e,r</w>} x2:
    #   (l,o)=7 wins round 1; (lo,w</w>)=5 wins round 2; round 3 is a
    #   3-way tie at 2 — (e,r</w>) < (lo,w) < (w,e) lexicographically —
    #   then (lo,w)=2, then (low,er</w>)=2.
    art = train_bpe(["low low low low low", "lower lower"], num_merges=10)
    assert art["merges"] == [
        ["l", "o"],
        ["lo", "w</w>"],
        ["e", "r</w>"],
        ["lo", "w"],
        ["low", "er</w>"],
    ]
    tok = BPETokenizer(art)
    assert tok._encode_word("low") == ("low</w>",)
    assert tok._encode_word("lower") == ("lower</w>",)
    # unseen word falls back to known symbols / UNK
    ids = tok.encode("lox")
    assert UNK in ids.tolist() or len(ids) > 1


def test_train_bpe_deterministic():
    texts = ["a b ab abc", "abc ab b a", "xyz xyz"]
    a = train_bpe(texts, num_merges=50)
    b = train_bpe(list(texts), num_merges=50)
    assert a == b


def _reference_encode(word: str, merges: list[list[str]]) -> tuple[str, ...]:
    """Textbook BPE: apply each merge globally, in rank order."""
    if len(word) == 1:
        syms = [word + "</w>"]
    else:
        syms = list(word[:-1]) + [word[-1] + "</w>"]
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return tuple(syms)


def test_rank_greedy_matches_textbook_reference():
    art = train_bpe(
        ["the quick brown fox jumps over the lazy dog"] * 3
        + ["pack my box with five dozen liquor jugs"] * 2,
        num_merges=64,
    )
    tok = BPETokenizer(art)
    words = "the quick brown fox jumps lazily over boxed dogs liquor junk".split()
    for w in words:
        assert tok._encode_word(w) == _reference_encode(w, art["merges"]), w


# ---------------------------------------------------------------------------
# the fixed-width tokenize contract (tokenizer_wrapper.py:6-15)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tok() -> BPETokenizer:
    return BPETokenizer.from_file(DEFAULT_VOCAB)


def test_tokenize_contract_width_pad_truncate(tok):
    for text, ml in [("key agg row", 16), ("", 8), ("key " * 500, 64)]:
        out = tok.tokenize(text, max_length=ml)
        assert out.shape == (ml,) and out.dtype == np.int32
        assert out[0] == CLS
        body = tok.encode(text)
        n = min(len(body), ml - 2)
        assert out[1 + n] == SEP
        assert (out[2 + n :] == PAD).all()
        assert (out[1 : 1 + n] == body[:n]).all()


def test_offsets_tile_pretokens(tok):
    text = "merge batch [M] part value [M] spark"
    ids, offs = tok.encode_with_offsets(text)
    # every span's text re-encodes to exactly that token's symbol width
    for (s, e), i in zip(offs, ids):
        assert 0 <= s < e <= len(text)
    # [M] spans map to the mention id
    m_spans = [o for o, i in zip(offs, ids) if i == MENTION]
    assert [text[s:e] for s, e in m_spans] == ["[M]", "[M]"]
    # spans within each word are contiguous
    for w_start, w_end in ((0, 5), (6, 11)):
        covered = [o for o in offs if w_start <= o[0] < w_end]
        assert covered[0][0] == w_start


# ---------------------------------------------------------------------------
# the cutter (tokens_cutter.py:33-163 parity)
# ---------------------------------------------------------------------------


def _mention_ids(tok, marked: str) -> np.ndarray:
    ids, _ = tok.encode_with_offsets(marked)
    s, e = token_mention_span(ids)
    return ids[s:e]


def _assert_mention_present(out: np.ndarray, mention: np.ndarray):
    """The mention token run (incl. both [M]) appears contiguously."""
    o = out.tolist()
    m = mention.tolist()
    assert any(o[i : i + len(m)] == m for i in range(len(o) - len(m) + 1))


def test_cut_mid(tok):
    words = [f"w{i} key" for i in range(40)]
    text = " ".join(words[:20]) + " [M] table [M] " + " ".join(words[20:])
    out = cut_mention_with_context(text, tok, expected_size=32)
    assert out.shape == (32,) and out[0] == CLS
    _assert_mention_present(out, _mention_ids(tok, text))
    # budget fully spent: no padding in a mid cut over a long text
    assert PAD not in out.tolist()


def test_cut_more_on_right(tok):
    text = "[M] key [M] " + " ".join("agg row scan slow fast".split() * 20)
    out = cut_mention_with_context(text, tok, expected_size=24)
    assert out.shape == (24,)
    _assert_mention_present(out, _mention_ids(tok, text))
    assert out[1] == MENTION  # mention at the left edge: cut keeps text[:...]


def test_cut_more_on_left(tok):
    text = " ".join("agg row scan slow fast".split() * 20) + " [M] key [M]"
    out = cut_mention_with_context(text, tok, expected_size=24)
    assert out.shape == (24,)
    _assert_mention_present(out, _mention_ids(tok, text))
    assert out.tolist().index(MENTION) > 1  # left context precedes mention


def test_cut_mention_too_large(tok):
    # mention longer than expected_size - 4: keep its head, restore [M]
    text = "pre pre pre [M] " + " ".join(f"key agg row" for _ in range(20)) + " [M] post"
    out = cut_mention_with_context(text, tok, expected_size=16)
    assert out.shape == (16,)
    assert out[1] == MENTION  # opening label survives
    assert MENTION in out[2:].tolist()  # closing label re-appended
    assert out[0] == CLS


def test_cut_short_text_pads(tok):
    text = "key [M] agg [M] row"
    out = cut_mention_with_context(text, tok, expected_size=64)
    assert out.shape == (64,)
    _assert_mention_present(out, _mention_ids(tok, text))
    assert PAD in out.tolist()


def test_cut_width_and_mention_property_sweep(tok):
    """Property sweep across corpus-like docs + mention positions +
    budgets: output is ALWAYS expected_size wide and ALWAYS contains
    both [M] markers."""
    rng = np.random.RandomState(7)
    lex = "key agg row scan slow fast table value part hash merge batch spark line sort window the a".split()
    for trial in range(60):
        n = int(rng.randint(1, 120))
        words = [lex[i] for i in rng.randint(0, len(lex), n)]
        m = int(rng.randint(0, n))
        words[m] = f"[M] {words[m]} [M]"
        text = " ".join(words)
        size = int(rng.choice([8, 16, 24, 64]))
        out = cut_mention_with_context(text, tok, expected_size=size)
        assert out.shape == (size,)
        assert out[0] == CLS
        assert (out == MENTION).sum() >= 2 or size <= 6


def test_mention_span_errors(tok):
    ids, _ = tok.encode_with_offsets("no mention here")
    with pytest.raises(ValueError, match="mention not found"):
        token_mention_span(ids)


# ---------------------------------------------------------------------------
# golden artifacts (driver-oracle inputs) + Ray stage
# ---------------------------------------------------------------------------


def test_golden_doc_tokens_matches_recompute(tok):
    docs = pq.read_table(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    golden = pq.read_table("mel_ray/data/golden_doc_tokens.parquet").to_pandas()
    want = {}
    for did, text in zip(docs["doc_id"].to_pylist()[:25], docs["text"].to_pylist()[:25]):
        want[(did, hashlib.md5(text.encode()).hexdigest())] = tok.tokenize(text, 64)
    g = golden.set_index(["doc_id", "text_md5"])
    for key, row in want.items():
        got = g.loc[key].sort_values("pos")["token_id"].to_numpy()
        assert (got == row).all(), key


def test_tokenize_stage_long_format(ray_session):
    from mel_ray import tokenops

    out = tokenops.doc_tokens_bpe(SF001).to_pandas()
    n_docs = out["doc_id"].nunique()
    assert len(out) == n_docs * 64
    assert set(out.columns) == {"doc_id", "pos", "token_id"}
    per = out.groupby("doc_id")["pos"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all() and (per["max"] == 63).all() and (per["count"] == 64).all()
    # first slot is always CLS
    assert (out.loc[out.pos == 0, "token_id"] == CLS).all()


def test_cut_stage_long_format(ray_session):
    from mel_ray import tokenops

    out = tokenops.doc_mention_context_cut(SF001).to_pandas()
    assert len(out) % 64 == 0 and len(out) > 0
    # every doc row contains both mention markers
    m_per_doc = out[out.token_id == MENTION].groupby("doc_id").size()
    assert (m_per_doc >= 2).all()
    assert m_per_doc.index.nunique() == out["doc_id"].nunique()


def test_specials_are_stable():
    # the golden tables and checkpointed token outputs depend on these
    assert SPECIALS == {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[M]": 4}
