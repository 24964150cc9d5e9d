"""Encoder factory / pooling wrappers / embed stage (T2 plug point:
model_builder.py:23-69 + pooling_wrappers.py:5-50 parity)."""

from __future__ import annotations

import numpy as np
import pytest

from mel_ray.state.encoder import (
    EncoderSpec,
    _mean_pool,
    bag_encoder,
    build_encoder,
)

SF001 = "/root/testdata/sf0.001"


def test_bag_encoder_token_level_shape_and_determinism():
    model = bag_encoder(dim=16)
    ids = np.array([[2, 5, 9, 0], [2, 7, 0, 0]], dtype=np.int64)
    mask = (ids != 0).astype(np.int8)
    a, b = model(ids, mask), model(ids, mask)
    assert a.shape == (2, 4, 16) and a.dtype == np.float32
    assert (a == b).all()
    # same token id -> same vector everywhere (an embedding TABLE)
    assert (a[0, 0] == a[1, 0]).all()


def test_mean_pool_masks_padding():
    states = np.ones((1, 3, 4), dtype=np.float32)
    states[0, 2] = 100.0  # padded position must not contribute
    mask = np.array([[1, 1, 0]], dtype=np.int8)
    out = _mean_pool(states, mask)
    assert np.allclose(out, states[0, 0] / np.linalg.norm(states[0, 0]))


def test_build_encoder_pooling_and_dim_enforcement():
    spec = EncoderSpec(pooling="mean", dim=8, kwargs={"dim": 32})
    enc = build_encoder(spec)
    ids = np.array([[2, 5, 9, 3]], dtype=np.int64)
    mask = np.ones_like(ids, dtype=np.int8)
    out = enc(ids, mask)
    assert out.shape == (1, 8)
    # cls pooling differs from mean pooling on the same model
    cls = build_encoder(EncoderSpec(pooling="cls", dim=8, kwargs={"dim": 32}))(ids, mask)
    assert not np.allclose(out, cls)
    with pytest.raises(ValueError, match="pooling"):
        build_encoder(EncoderSpec(pooling="max"))


def _tiny_factory(scale: float = 2.0):
    """A user-supplied 'model': constant-scale embedding table."""

    def states(ids, mask):
        return np.full((*ids.shape, 4), scale, dtype=np.float32) * (
            ids[..., None].astype(np.float32) + 1.0
        )

    return states


def test_custom_factory_pluggable_by_callable_and_dotted_path():
    # callable (in-process) and dotted path (what ships to actors)
    by_callable = build_encoder(EncoderSpec(factory=_tiny_factory, pooling="cls"))
    by_path = build_encoder(
        EncoderSpec(factory="tests.test_encoder._tiny_factory", pooling="cls")
    )
    ids = np.array([[3, 1]], dtype=np.int64)
    mask = np.ones_like(ids, dtype=np.int8)
    assert np.allclose(by_callable(ids, mask), by_path(ids, mask))
    assert np.allclose(by_callable(ids, mask), 2.0 * 4.0)  # (id 3 + 1) * scale


@pytest.mark.usefixtures("ray_session")
def test_embed_documents_stage():
    from mel_ray import tokenops
    from mel_ray.functions.bpe import BPETokenizer
    from mel_ray.stages.embed import embed_documents
    from mel_ray.stages.tokenize import DEFAULT_VOCAB
    from mel_ray.state.encoder import EncoderSpec, build_encoder
    from mel_ray.util import read_parquet_clean

    out = tokenops.doc_embed_tokens(SF001).to_pandas()
    assert len(out) == 500
    assert all(len(v) == 64 for v in out["emb"].head(20))

    # end-to-end determinism vs a direct (non-Ray) recompute of one doc
    docs = read_parquet_clean(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    row = docs.take(1)[0]
    tok = BPETokenizer.from_file(DEFAULT_VOCAB)
    ids = tok.tokenize(row["text"], 64)[None, :].astype(np.int64)
    mask = (ids != 0).astype(np.int8)
    want = build_encoder(EncoderSpec())(ids, mask)[0]
    got = np.asarray(out.set_index("doc_id").loc[row["doc_id"], "emb"], dtype=np.float32)
    assert np.allclose(got, want, atol=1e-6)
