"""Model-checkpoint save/load (S11: torch.save(state_dict) recast,
reference finetune_model/data.py:25-41): atomic npz + integrity
manifest, final/intermediate selection, and the once-per-actor weight
load in the scorer stage."""

import numpy as np
import pytest

from mel_ray.config import ScoringConfig
from mel_ray.state.model_ckpt import (
    DEFAULT_WEIGHTS,
    default_model_state,
    latest_checkpoint,
    load_model_checkpoint,
    save_model_checkpoint,
    scorer_weights,
)


def test_roundtrip_and_latest(tmp_path):
    state = default_model_state()
    save_model_checkpoint(state, tmp_path, step=10)
    save_model_checkpoint(state, tmp_path, step=20)
    # no final yet -> highest step wins
    assert latest_checkpoint(tmp_path).name == "model_step00000020.npz"
    final = save_model_checkpoint(state, tmp_path)
    assert latest_checkpoint(tmp_path) == final
    loaded = load_model_checkpoint(tmp_path)
    assert set(loaded) == set(state)
    for k in state:
        np.testing.assert_array_equal(loaded[k], state[k])


def test_corruption_detected(tmp_path):
    state = default_model_state()
    p = save_model_checkpoint(state, tmp_path)
    # rewrite the npz with a flipped weight but keep the old manifest
    bad = dict(state)
    bad["score_weights"] = state["score_weights"] + 1.0
    with open(p, "wb") as f:
        np.savez(f, **bad)
    with pytest.raises(ValueError, match="sha mismatch"):
        load_model_checkpoint(p)


def test_scorer_weights_from_checkpoint(tmp_path):
    # default: no checkpoint configured
    assert scorer_weights(ScoringConfig()) is DEFAULT_WEIGHTS
    state = default_model_state()
    state["score_weights"] = np.array([0.25, 0.25, 0.25, 0.25])
    p = save_model_checkpoint(state, tmp_path)
    w = scorer_weights(ScoringConfig(model_checkpoint=str(p)))
    np.testing.assert_array_equal(w, [0.25, 0.25, 0.25, 0.25])


def test_combine_scores_default_bit_identical():
    from mel_ray.stages.scoring import combine_scores

    rng = np.random.default_rng(7)
    est_j = rng.random(100).astype(np.float32)
    cos = (rng.random(100) * 2 - 1).astype(np.float32)
    pjw = rng.random(100)
    rjw = rng.random(100)
    expect = (0.6 * est_j + 0.3 * np.maximum(cos, 0) + 0.05 * pjw + 0.05 * rjw).astype(
        np.float32
    )
    got = combine_scores(DEFAULT_WEIGHTS, est_j, cos, pjw, rjw)
    np.testing.assert_array_equal(got, expect)
    # reweighting actually changes the model's output
    other = combine_scores(np.array([1.0, 0.0, 0.0, 0.0]), est_j, cos, pjw, rjw)
    assert not np.array_equal(other, expect)
