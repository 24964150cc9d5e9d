"""Pure-NumPy + stdlib-zlib PNG codec (8-bit, non-interlaced).

Third real image format behind ``decode_image`` (after BMP and baseline
JPEG): PNG is chunked zlib-compressed scanlines with a per-row predictor
filter, so the stdlib ``zlib`` module plus NumPy covers the whole spec
surface we need — color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA) at bit depth 8, filters 0-4.

Decode vectorization: filters None/Sub/Up are fully vectorized (Sub via
per-lane cumsum mod 256); Average/Paeth have a true sequential
dependency along the row, handled with a per-pixel loop over row width
operating on all channels at once.  The encoder can emit any fixed
filter type (used by the tests to exercise every decode path) and picks
Up by default.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecs import CodecError

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 2, level: int = 6) -> bytes:
    """(H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 -> PNG bytes.

    ``filter_type`` applies one fixed filter to every row (0=None 1=Sub
    2=Up 3=Average 4=Paeth) — filtering is the forward direction and
    vectorizes for all five types."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise CodecError("encode_png wants (H,W), (H,W,3) or (H,W,4) uint8")
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    if not (0 <= filter_type <= 4):
        raise CodecError("filter_type must be 0..4")

    flat = img.reshape(h, w * c).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, c:] = flat[:, :-c]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    if filter_type == 0:
        raw = flat
    elif filter_type == 1:
        raw = flat - left
    elif filter_type == 2:
        raw = flat - up
    elif filter_type == 3:
        raw = flat - (left + up) // 2
    else:  # Paeth predictor
        ul = np.zeros_like(flat)
        ul[1:, c:] = flat[:-1, :-c]
        p = left + up - ul
        pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, ul))
        raw = flat - pred
    rows = np.empty((h, 1 + w * c), dtype=np.uint8)
    rows[:, 0] = filter_type
    rows[:, 1:] = (raw & 0xFF).astype(np.uint8)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(rows.tobytes(), level)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes | memoryview) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8, C = native channel count (palette
    entries are expanded to RGB)."""
    buf = bytes(memoryview(payload))
    if buf[:8] != PNG_MAGIC:
        raise CodecError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise CodecError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise CodecError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise CodecError(f"unsupported PNG (depth={depth} comp={comp} filt={filt})")
    if interlace != 0:
        raise CodecError("Adam7 interlacing not supported")
    if color_type not in _CHANNELS:
        raise CodecError(f"unsupported PNG color type {color_type}")
    c = _CHANNELS[color_type]
    stride = 1 + w * c
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(data) != h * stride:
        raise CodecError("PNG scanline payload has the wrong size")
    rows = data.reshape(h, stride)
    ftypes = rows[:, 0]
    raw = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, w * c), dtype=np.int64)
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        f, r = int(ftypes[y]), raw[y]
        if f == 0:
            rec = r
        elif f == 1:  # Sub: per-lane cumsum mod 256
            rec = r.copy()
            for j in range(c):
                rec[j::c] = np.cumsum(rec[j::c]) % 256
        elif f == 2:  # Up
            rec = (r + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential along the row
            rec = np.zeros(w * c, dtype=np.int64)
            left = np.zeros(c, dtype=np.int64)
            ul = np.zeros(c, dtype=np.int64)
            for x in range(w):
                sl = slice(x * c, (x + 1) * c)
                up = prev[sl]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_),
                        left,
                        np.where(pb_ <= pc_, up, ul),
                    )
                left = (r[sl] + pred) % 256
                rec[sl] = left
                ul = up
        else:
            raise CodecError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, c)
    if color_type == 3:
        if plte is None:
            raise CodecError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def decode_png_rgb(payload: bytes | memoryview) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB (gray broadcast, alpha dropped) —
    the ``decode_image`` contract."""
    img = decode_png(payload)
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img
