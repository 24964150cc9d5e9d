"""PNG codec (functions/png.py): lossless roundtrips across every
filter type and color type, palette expansion, the decode_image /
encode_image_like dispatch, and malformed-payload rejection."""

import struct
import zlib

import numpy as np
import pytest

from mel_ray.functions.codecs import CodecError, decode_image, encode_image_like
from mel_ray.functions.png import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    decode_png_rgb,
    encode_png,
)


def _img(h, w, c, seed=3):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_every_filter(filter_type):
    img = _img(23, 17, 3, seed=filter_type)
    out = decode_png(encode_png(img, filter_type=filter_type))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_roundtrip_color_types(c):
    img = _img(9, 31, c)
    out = decode_png(encode_png(img, filter_type=4))
    expect = img[:, :, None] if c == 1 else img
    np.testing.assert_array_equal(out, expect)


def test_palette_png_decodes():
    # hand-build a color-type-3 PNG: 4x2 indices into an 8-entry palette
    rng = np.random.RandomState(11)
    plte = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (2, 4)).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    payload = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(payload), plte[idx])


def test_decode_image_dispatch_and_like_encode():
    img = _img(12, 12, 3)
    png = encode_png(img)
    np.testing.assert_array_equal(decode_image(png), img)
    again = encode_image_like(img, png)
    assert again[:8] == PNG_MAGIC
    np.testing.assert_array_equal(decode_image(again), img)


def test_rgb_view_of_gray_and_alpha():
    gray = _img(5, 7, 1)
    rgb = decode_png_rgb(encode_png(gray))
    np.testing.assert_array_equal(rgb, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = _img(5, 7, 4)
    np.testing.assert_array_equal(decode_png_rgb(encode_png(rgba)), rgba[:, :, :3])


def test_malformed_rejected():
    with pytest.raises(CodecError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    good = encode_png(_img(6, 6, 3))
    with pytest.raises((CodecError, zlib.error)):
        decode_png(good[: len(good) // 2])  # truncated mid-IDAT
    # fuzz: random byte flips must raise CodecError or decode, never crash
    rng = np.random.RandomState(5)
    for _ in range(50):
        b = bytearray(good)
        b[rng.randint(8, len(b))] ^= 0xFF
        try:
            decode_png(bytes(b))
        except (CodecError, zlib.error):
            pass
