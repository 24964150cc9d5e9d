"""Pure-NumPy baseline JPEG codec: roundtrip quality, container
variants (4:4:4 / 4:2:0 / grayscale / restart intervals), robustness,
and the multimodal-stage dispatch that consumes it."""

import numpy as np
import pyarrow as pa
import pytest

from mel_ray.functions.codecs import CodecError, decode_image, encode_image_like
from mel_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _test_image(h: int, w: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 17) * np.cos(yy / 23),
            128 + 80 * np.cos(xx / 11),
            128 + 60 * np.sin((xx + yy) / 31),
        ],
        axis=-1,
    )
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else 99.0


class TestJpegRoundtrip:
    @pytest.mark.parametrize("shape", [(64, 64), (48, 40), (33, 29), (8, 8), (17, 5)])
    def test_color_roundtrip_all_variants(self, shape):
        img = _test_image(*shape)
        for kw, floor in [
            (dict(quality=90), 33.0),
            (dict(quality=50), 26.0),
            (dict(quality=90, subsample="420"), 31.0),
            (dict(quality=90, restart_interval=3), 33.0),
            (dict(quality=85, subsample="420", restart_interval=2), 30.0),
        ]:
            payload = encode_jpeg(img, **kw)
            dec = decode_jpeg(payload)
            assert dec.shape == img.shape
            assert _psnr(img, dec) > floor, kw

    def test_grayscale_single_component_scan(self):
        g = _test_image(40, 56)[:, :, 0]
        dec = decode_jpeg(encode_jpeg(g, quality=90))
        assert dec.shape == (40, 56, 3)
        assert (dec[:, :, 0] == dec[:, :, 1]).all()
        assert _psnr(np.repeat(g[:, :, None], 3, 2), dec) > 33.0

    def test_flat_image_is_near_lossless(self):
        img = np.full((24, 24, 3), 130, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert int(np.abs(dec.astype(int) - 130).max()) <= 2

    def test_quality_monotone_in_size(self):
        img = _test_image(64, 64)
        sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 95)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_restart_interval_output_matches_unrestarted(self):
        img = _test_image(48, 48)
        a = decode_jpeg(encode_jpeg(img, quality=80))
        b = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=1))
        assert (a == b).all()  # restarts change framing, not pixels


class TestJpegRobustness:
    def test_rejects_non_jpeg(self):
        with pytest.raises(CodecError):
            decode_jpeg(b"BM not a jpeg")

    def test_rejects_truncated_scan(self):
        payload = encode_jpeg(_test_image(32, 32), quality=85)
        with pytest.raises(CodecError):
            decode_jpeg(payload[: len(payload) // 2])

    def test_rejects_progressive_marker(self):
        payload = bytearray(encode_jpeg(_test_image(16, 16)))
        sof = payload.find(b"\xff\xc0")
        payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(CodecError):
            decode_jpeg(bytes(payload))

    def test_image_dispatch_by_magic(self):
        from mel_ray.functions.codecs import encode_bmp

        img = _test_image(20, 24)
        assert (decode_image(encode_bmp(img)) == img).all()
        assert decode_image(encode_jpeg(img)).shape == img.shape
        with pytest.raises(CodecError):
            decode_image(b"\x00\x01???")

    def test_encode_image_like_preserves_container(self):
        img = _test_image(16, 16)
        assert encode_image_like(img, encode_jpeg(img))[:2] == b"\xff\xd8"
        from mel_ray.functions.codecs import encode_bmp

        assert encode_image_like(img, encode_bmp(img))[:2] == b"BM"


class TestJpegFuzz:
    def test_truncation_and_corruption_raise_codec_error(self):
        """Any truncation point and any single-bit corruption must either
        decode or raise CodecError — never crash with a raw exception."""
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (24, 36, 3), dtype=np.uint8).astype(np.uint8)
        for kw in (dict(), dict(subsample="420"), dict(restart_interval=2)):
            payload = encode_jpeg(img, **kw)
            for cut in range(4, len(payload), 31):
                try:
                    decode_jpeg(payload[:cut])
                except CodecError:
                    pass
            for _ in range(60):
                b = bytearray(payload)
                b[rng.integers(2, len(b) - 2)] ^= 1 << rng.integers(0, 8)
                try:
                    decode_jpeg(bytes(b))
                except CodecError:
                    pass


class TestJpegInStages:
    def test_real_feature_stage_decodes_jpeg_payloads(self, ray_session):
        """synth media (half the images now JPEG) through the real-decoder
        actor-pool feature stage: every row decodes and normalizes."""
        from mel_ray.stages.multimodal import MediaFeatureExtractor, synth_media_dataset

        ds = synth_media_dataset(24, real_codecs=True)
        kinds = [r["kind"] for r in ds.take_all()]
        assert "image" in kinds
        out = ds.map_batches(
            MediaFeatureExtractor,
            fn_constructor_args=(16, "real"),
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
            num_cpus=0.5,
        ).take_all()
        assert len(out) == 24
        for r in out:
            f = np.asarray(r["features"])
            assert f.shape == (16,) and abs(np.linalg.norm(f) - 1.0) < 1e-3

    def test_real_resize_roundtrips_jpeg(self, ray_session):
        from mel_ray.stages.multimodal import MediaResizer

        img = _test_image(20, 30)
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "kind": pa.array(["image"], pa.string()),
                "payload": pa.array([encode_jpeg(img, quality=90)], pa.large_binary()),
                "width": pa.array([30], pa.int32()),
                "height": pa.array([20], pa.int32()),
                "sample_rate": pa.array([0], pa.int32()),
            }
        )
        out = MediaResizer(target_w=8, target_h=6, decoder="real")(batch)
        payload = out["payload"][0].as_buffer()
        assert bytes(memoryview(payload)[:2]) == b"\xff\xd8"  # stayed JPEG
        dec = decode_image(payload)
        assert dec.shape == (6, 8, 3)


class TestMotionJpegAvi:
    def test_mjpeg_avi_roundtrip_and_dib_unchanged(self):
        """MJPEG AVI (baseline-JPEG frames in 00dc chunks) decodes close
        to the source; the DIB path stays byte-exact."""
        from mel_ray.functions.codecs import decode_avi, encode_avi

        yy, xx = np.mgrid[0:24, 0:20]
        base = np.clip(
            np.stack([128 + 90 * np.sin(xx / 7), 128 + 70 * np.cos(yy / 9),
                      128 + 50 * np.sin((xx + yy) / 11)], -1),
            0, 255,
        ).astype(np.uint8)
        frames = np.stack([np.roll(base, 2 * i, axis=1) for i in range(5)])
        exact, fps = decode_avi(encode_avi(frames, fps=12, codec="dib"))
        assert (exact == frames).all() and fps == 12
        got, fps2 = decode_avi(encode_avi(frames, fps=12, codec="mjpg", quality=90))
        assert got.shape == frames.shape and fps2 == 12
        mse = np.mean((got.astype(float) - frames.astype(float)) ** 2)
        assert 10 * np.log10(255.0**2 / mse) > 33.0

    def test_real_frame_sampler_handles_mjpeg(self, ray_session):
        """The real-decoder frame sampler demuxes a Motion-JPEG payload."""
        from mel_ray.functions.codecs import decode_bmp, encode_avi
        from mel_ray.stages.multimodal import FrameSampler

        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, (6, 12, 10, 3), dtype=np.uint16).astype(np.uint8)
        batch = pa.table(
            {
                "media_id": pa.array([3], pa.int64()),
                "kind": pa.array(["video"], pa.string()),
                "payload": pa.array(
                    [encode_avi(frames, fps=10, codec="mjpg", quality=90)],
                    pa.large_binary(),
                ),
                "width": pa.array([10], pa.int32()),
                "height": pa.array([12], pa.int32()),
                "sample_rate": pa.array([0], pa.int32()),
            }
        )
        out = FrameSampler(n_frames=6, step=2, decoder="real")(batch)
        assert len(out) == 3  # frames 0, 2, 4
        img = decode_bmp(out["frame"][0].as_buffer())
        assert img.shape == (12, 10, 3)
