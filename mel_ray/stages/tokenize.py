"""Actor-pool tokenization stages (M6/M7 + M8/M9).

The reference runs its tokenizer inside pipeline workers that construct
the HF tokenizer once per process (``src/tokenization/pipeline/
tokenizers/*`` via TokenizerWrapper, tokenizer_wrapper.py:1-15); the
Ray-native shape is a callable CLASS on ``map_batches`` — vocab loaded
once per actor in ``__init__``, per-batch work in ``__call__``
(the T1/T2 stateful-stage pattern, same as scoring.PairScorer).

Output is LONG format (doc_id, pos, token_id): one row per token slot,
exactly ``expected_size`` rows per document — the fixed-width shape
contract the reference pins in
``tests/tokenization/pipeline/test_pipeline.py:71-89``
(tokens.shape == (n, expected_size), integer dtype) made
shuffle-friendly and SQL-comparable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_VOCAB = str(Path(__file__).resolve().parent.parent / "data" / "bpe_vocab.json")


def _long_format(doc_ids: np.ndarray, rows: list[np.ndarray], width: int) -> pa.Table:
    if not rows:
        e = pa.array([], pa.int64())
        return pa.table({"doc_id": e, "pos": e, "token_id": e})
    mat = np.vstack(rows)  # (n_docs, width) int32
    n = mat.shape[0]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, width).astype(np.int64)),
            "pos": pa.array(np.tile(np.arange(width, dtype=np.int64), n)),
            "token_id": pa.array(mat.reshape(-1).astype(np.int64)),
        }
    )


class TokenizeDocs:
    """documents batch -> fixed-width token rows (TokenizerWrapper
    parity: pad to ``expected_size``, truncate beyond it).

    ``output="long"`` emits (doc_id, pos, token_id) — the SQL-comparable
    shape; ``output="packed"`` emits (doc_id, input_ids
    fixed_size_list<int32>[W], attention_mask fixed_size_list<int8>[W])
    — the zero-copy inference shape the encoder stage consumes (one
    ``np.reshape`` recovers the (n, W) matrix, no per-row work)."""

    def __init__(
        self,
        vocab_path: str = DEFAULT_VOCAB,
        expected_size: int = 64,
        output: str = "long",
    ):
        from ..functions.bpe import BPETokenizer

        self.tok = BPETokenizer.from_file(vocab_path)  # once per actor
        self.expected_size = expected_size
        if output not in ("long", "packed"):
            raise ValueError(f"output must be long|packed, got {output!r}")
        self.output = output

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.bpe import PAD

        texts = batch["text"].to_pylist()
        rows = [self.tok.tokenize(t or "", self.expected_size) for t in texts]
        if self.output == "long":
            return _long_format(batch["doc_id"].to_numpy(), rows, self.expected_size)
        w = self.expected_size
        mat = (
            np.vstack(rows) if rows else np.empty((0, w), dtype=np.int32)
        )
        mask = (mat != PAD).astype(np.int8)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "input_ids": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.int32()), w
                ),
                "attention_mask": pa.FixedSizeListArray.from_arrays(
                    pa.array(mask.reshape(-1), pa.int8()), w
                ),
            }
        )


class CutMentions:
    """documents batch -> budget-aware mention+context token rows.

    The mention is synthesized deterministically (the middle pre-token
    of each document, bracketed by ``[M]``) so the op is reproducible
    without a mention table; real pipelines pass text already carrying
    ``[M]`` markers and set ``synthesize_mention=False``."""

    def __init__(
        self,
        vocab_path: str = DEFAULT_VOCAB,
        expected_size: int = 64,
        synthesize_mention: bool = True,
    ):
        from ..functions.bpe import BPETokenizer

        self.tok = BPETokenizer.from_file(vocab_path)
        self.expected_size = expected_size
        self.synthesize = synthesize_mention

    @staticmethod
    def mark_middle_word(text: str) -> str | None:
        words = text.split()
        if not words:
            return None
        m = len(words) // 2
        return " ".join(words[:m] + ["[M]", words[m], "[M]"] + words[m + 1 :])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokens_cut import cut_mention_with_context

        doc_ids, rows = [], []
        for did, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].to_pylist()
        ):
            t = self.mark_middle_word(text or "") if self.synthesize else text
            if not t:
                continue
            rows.append(cut_mention_with_context(t, self.tok, self.expected_size))
            doc_ids.append(did)
        return _long_format(np.asarray(doc_ids, dtype=np.int64), rows, self.expected_size)


def tokenize_documents(
    ds: "ray.data.Dataset",
    vocab_path: str = DEFAULT_VOCAB,
    expected_size: int = 64,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    from ..util import auto_pool_size

    return ds.map_batches(
        TokenizeDocs,
        fn_constructor_args=(vocab_path, expected_size),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=auto_pool_size(concurrency),
        num_cpus=0.5,
    )


def cut_mention_documents(
    ds: "ray.data.Dataset",
    vocab_path: str = DEFAULT_VOCAB,
    expected_size: int = 64,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    from ..util import auto_pool_size

    return ds.map_batches(
        CutMentions,
        fn_constructor_args=(vocab_path, expected_size),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=auto_pool_size(concurrency),
        num_cpus=0.5,
    )
