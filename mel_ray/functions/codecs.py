"""Pure-NumPy media codecs: BMP (24-bit BI_RGB) and WAV (16-bit PCM).

Makes ``decoder="real"`` real for one image and one audio format with no
external libraries (both formats are header + raw samples, so a NumPy
reshape IS the decode).  Encoders exist so tests and the synthetic media
generator can produce valid payloads deterministically.  The video
demuxer stays honestly stubbed (no container format is parseable without
ffmpeg-class code).

Format references are the public specs: Windows BITMAPFILEHEADER /
BITMAPINFOHEADER layout and the RIFF/WAVE chunk layout.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported media payload."""


# --------------------------------------------------------------------------
# BMP: 24-bit uncompressed (BI_RGB), bottom-up rows, 4-byte row padding
# --------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> BMP bytes (24-bit BI_RGB)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise CodecError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    image_size = row_bytes * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + image_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # BGR order, bottom-up row order
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes | memoryview) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB.  Supports the encoder's subset:
    24-bit BI_RGB with BITMAPINFOHEADER; top-down (negative height) and
    bottom-up images both handled."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 54 or bytes(buf[:2].tobytes()) != b"BM":
        raise CodecError("not a BMP payload")
    offset = int(np.frombuffer(buf[10:14].tobytes(), dtype="<u4")[0])
    hdr_size, w, h = struct.unpack("<Iii", buf[14:26].tobytes())
    planes, bpp, compression = struct.unpack("<HHI", buf[26:34].tobytes())
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise CodecError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise CodecError("degenerate BMP dimensions")
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(buf) < need:
        raise CodecError("truncated BMP pixel data")
    rows = buf[offset : offset + row_bytes * h].reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) via two index gathers."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi][:, xi]


# --------------------------------------------------------------------------
# WAV: RIFF/WAVE, PCM 16-bit little-endian
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(N,) or (N, channels) int16 -> WAV bytes (PCM 16-bit)."""
    if samples.dtype != np.int16:
        raise CodecError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes | memoryview) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((N, channels) int16 samples, sample_rate)."""
    buf = bytes(payload)
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise CodecError("not a WAV payload")
    pos, n_ch, rate, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise CodecError("short fmt chunk")
            audio_format, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_format != 1 or bits != 16:
                raise CodecError(f"unsupported WAV (format={audio_format}, bits={bits})")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or n_ch is None:
        raise CodecError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data[: (len(data) // (2 * n_ch)) * 2 * n_ch], dtype="<i2")
    return samples.reshape(-1, n_ch), int(rate)
