"""AudioSpectrogram / ShotDetector: real-decode analysis stages verified
on planted signals (a pure tone must peak in its FFT band; a hard cut
between static scenes must be the only shot boundary)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from mel_ray.functions import codecs
from mel_ray.stages.multimodal import audio_spectrogram, detect_shots


def _media_ds(rows):
    tbl = pa.table(
        {
            "media_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "kind": pa.array([r[0] for r in rows], pa.string()),
            "payload": pa.array([r[1] for r in rows], pa.large_binary()),
            "width": pa.array(np.zeros(len(rows), dtype=np.int32)),
            "height": pa.array(np.zeros(len(rows), dtype=np.int32)),
            "sample_rate": pa.array(
                np.where(np.array([r[0] for r in rows]) == "audio", 16000, 0).astype(
                    np.int32
                )
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(2)


@pytest.mark.usefixtures("ray_session")
def test_spectrogram_finds_pure_tone():
    rate = 16000
    t = np.arange(rate, dtype=np.float64) / rate  # 1 s
    for freq in (500.0, 3000.0):
        tone = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        ds = _media_ds([("audio", codecs.encode_wav(tone, rate))])
        row = audio_spectrogram(ds, n_bands=16).take_all()[0]
        bands = np.asarray(row["band_energy"])
        # the tone's rfft bin at win=256: freq/rate*256
        bin_i = freq / rate * 256
        # reconstruct the stage's band starts to find the expected band
        starts = np.maximum.accumulate(
            np.clip(np.round(np.geomspace(1, 128, 16)).astype(np.int64), 1, 128)
        )
        expect_band = int(np.searchsorted(starts, bin_i, side="right") - 1)
        assert int(np.argmax(bands)) == expect_band
        assert row["n_frames"] > 100
        assert abs(row["duration_sec"] - 1.0) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_shot_detector_counts_planted_cut():
    # 8 frames: 4 dark, then a hard cut to 4 bright -> exactly 2 shots
    dark = np.full((4, 12, 12, 3), 10, dtype=np.uint8)
    bright = np.full((4, 12, 12, 3), 200, dtype=np.uint8)
    vid = np.concatenate([dark, bright])
    ds = _media_ds([("video", codecs.encode_avi(vid, fps=10))])
    row = detect_shots(ds, threshold=24.0).take_all()[0]
    assert row["n_frames"] == 8
    assert row["n_shots"] == 2
    assert row["fps"] == 10
    # static video: a single shot
    row2 = detect_shots(_media_ds([("video", codecs.encode_avi(dark, fps=10))])).take_all()[0]
    assert row2["n_shots"] == 1
