"""Model-checkpoint save/load (S11: the reference's ``torch.save(state_dict)``
final/intermediate checkpoints, finetune_model/data.py:25-41, recast
dependency-free).

The "model" here is the scorer's parameter state — the score-combination
weights plus accept thresholds and encoder hyperparameters (the
deterministic hashed-n-gram encoder's weights ARE its constants, see
functions/embed.py).  Checkpoints are ``.npz`` files with a sidecar
manifest carrying a per-array sha256 and a whole-state fingerprint, so a
torn or corrupted write is detected at load (the same integrity
discipline as the stage manifests in ``state/manifest.py``).  Writes are
atomic (tmp + ``os.replace``), and step-numbered intermediates live next
to ``model_final`` exactly like the reference's per-epoch saves.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np

#: default score-combination weights: (est_jaccard, cosine, path_jw, repo_jw).
#: float64 so ``float(w[i])`` reproduces the literal-constant math bit-exactly.
DEFAULT_WEIGHTS = np.array([0.6, 0.3, 0.05, 0.05], dtype=np.float64)


def default_model_state(scoring=None) -> dict[str, np.ndarray]:
    """The scorer's full parameter state as a numpy state_dict."""
    from ..config import ScoringConfig

    cfg = scoring or ScoringConfig()
    return {
        "score_weights": DEFAULT_WEIGHTS.copy(),
        "accept_thresholds": np.array(
            [cfg.jaccard_accept, cfg.cosine_accept], dtype=np.float64
        ),
        "encoder_hparams": np.array([cfg.embed_dim, cfg.embed_kgram], dtype=np.int64),
    }


def _array_sha(arr: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(str(arr.dtype).encode())
    h.update(str(arr.shape).encode())
    h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def save_model_checkpoint(
    state: dict[str, np.ndarray], ckpt_dir: str | Path, step: int | None = None
) -> Path:
    """Atomically write ``state`` as ``model_final.npz`` (or
    ``model_step{step:08d}.npz``) + manifest; returns the npz path."""
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    name = "model_final" if step is None else f"model_step{step:08d}"
    npz_path = d / f"{name}.npz"
    tmp = d / f".{name}.npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **state)
        f.flush()
        os.fsync(f.fileno())
    shas = {k: _array_sha(np.asarray(v)) for k, v in sorted(state.items())}
    fingerprint = hashlib.sha256(json.dumps(shas, sort_keys=True).encode()).hexdigest()
    meta = {
        "arrays": {
            k: {
                "sha256": shas[k],
                "dtype": str(np.asarray(v).dtype),
                "shape": list(np.asarray(v).shape),
            }
            for k, v in sorted(state.items())
        },
        "fingerprint": fingerprint,
        "step": step,
    }
    tmp_meta = d / f".{name}.json.tmp"
    tmp_meta.write_text(json.dumps(meta, indent=1, sort_keys=True))
    # npz first, then the manifest: a manifest never points at a missing
    # or half-written npz
    os.replace(tmp, npz_path)
    os.replace(tmp_meta, d / f"{name}.json")
    return npz_path


def load_model_checkpoint(path: str | Path) -> dict[str, np.ndarray]:
    """Load + integrity-verify a checkpoint written by
    :func:`save_model_checkpoint`.  ``path`` may be the npz file or the
    checkpoint directory (-> ``model_final`` or the highest step)."""
    p = Path(path)
    if p.is_dir():
        p = latest_checkpoint(p)
    meta_path = p.with_suffix(".json")
    with np.load(p) as z:
        state = {k: z[k] for k in z.files}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if set(meta["arrays"]) != set(state):
            raise ValueError(f"checkpoint {p}: manifest/npz key mismatch")
        for k, info in meta["arrays"].items():
            got = _array_sha(state[k])
            if got != info["sha256"]:
                raise ValueError(
                    f"checkpoint {p}: array {k!r} sha mismatch "
                    f"(manifest {info['sha256'][:12]}, file {got[:12]})"
                )
    return state


def latest_checkpoint(ckpt_dir: str | Path) -> Path:
    """``model_final.npz`` if present, else the highest-step intermediate."""
    d = Path(ckpt_dir)
    final = d / "model_final.npz"
    if final.exists():
        return final
    steps = sorted(d.glob("model_step*.npz"))
    if not steps:
        raise FileNotFoundError(f"no model checkpoint under {d}")
    return steps[-1]


def scorer_weights(scoring) -> np.ndarray:
    """Score-combination weights for a scorer actor: the checkpointed
    state when ``ScoringConfig.model_checkpoint`` is set (loaded once per
    actor in ``__init__`` — the T2 pattern), else the defaults."""
    if getattr(scoring, "model_checkpoint", None):
        return np.asarray(
            load_model_checkpoint(scoring.model_checkpoint)["score_weights"],
            dtype=np.float64,
        )
    return DEFAULT_WEIGHTS
