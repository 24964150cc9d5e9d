"""Token-encoder actor-pool stage (T1/T2 — batched model "inference").

The reference embeds token rows with a transformer built once per
worker (``src/utils/embeddings.py:55-123`` batching over an npz token
table; model from ``ModelBuilder``); the Ray-native shape is a callable
class on ``map_batches``: the encoder is built from an
:class:`~mel_ray.state.encoder.EncoderSpec` in ``__init__`` (ONCE per
actor — the dotted-path factory means actors construct weights locally
instead of receiving them pickled), batches flow through as fixed-width
matrices recovered zero-copy from Arrow fixed_size_list columns.

Composed pipeline: documents -> TokenizeDocs(packed) -> TokenEncoder
-> (doc_id, emb fixed_size_list<float32>[dim]) — the tokenize/embed
halves of the reference's generate-epochs dataflow
(``finetunings/generate_epochs/embed_links_for_generation.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..state.encoder import EncoderSpec, build_encoder
from .tokenize import DEFAULT_VOCAB, TokenizeDocs


def _fixed_matrix(col: pa.ChunkedArray | pa.Array, dtype) -> np.ndarray:
    """fixed_size_list column -> (n, W) ndarray, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    w = col.type.list_size
    return np.asarray(col.values, dtype=dtype).reshape(len(col), w)


class TokenEncoder:
    """(doc_id, input_ids, attention_mask) -> (doc_id, emb)."""

    def __init__(self, spec: EncoderSpec):
        self.encode = build_encoder(spec)  # model built once per actor
        self.dim: int | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _fixed_matrix(batch["input_ids"], np.int64)
        mask = _fixed_matrix(batch["attention_mask"], np.int8)
        emb = self.encode(ids, mask)
        self.dim = emb.shape[1]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), pa.float32()), emb.shape[1]
                ),
            }
        )


def embed_documents(
    ds: "ray.data.Dataset",
    spec: EncoderSpec | None = None,
    vocab_path: str = DEFAULT_VOCAB,
    expected_size: int = 64,
    batch_size: int = 1024,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """documents (doc_id, text) -> (doc_id, emb): tokenize + encode as
    two pipelined actor-pool stages (tokens stream into the encoder
    block by block; nothing materializes in between)."""
    from ..util import auto_pool_size

    spec = spec or EncoderSpec()
    pool = auto_pool_size(concurrency)
    tokens = ds.map_batches(
        TokenizeDocs,
        fn_constructor_args=(vocab_path, expected_size, "packed"),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=0.5,
    )
    return tokens.map_batches(
        TokenEncoder,
        fn_constructor_args=(spec,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=0.5,
    )
