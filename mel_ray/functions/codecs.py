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


def decode_image(payload: bytes | memoryview) -> np.ndarray:
    """Image bytes -> (H, W, 3) uint8 RGB, dispatched on magic bytes:
    ``BM`` -> BMP, ``FF D8`` -> baseline JPEG (functions/jpeg.py),
    ``89 50`` -> PNG (functions/png.py)."""
    head = bytes(memoryview(payload)[:2])
    if head == b"BM":
        return decode_bmp(payload)
    if head == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if head == b"\x89P":
        from .png import decode_png_rgb

        return decode_png_rgb(payload)
    raise CodecError("unrecognized image format (expected BMP, JPEG or PNG)")


def encode_image_like(img: np.ndarray, like: bytes | memoryview) -> bytes:
    """Encode ``img`` in the same container format as ``like``'s payload
    (keeps a resize stage format-preserving)."""
    head = bytes(memoryview(like)[:2])
    if head == b"\xff\xd8":
        from .jpeg import encode_jpeg

        return encode_jpeg(img)
    if head == b"\x89P":
        from .png import encode_png

        return encode_png(img)
    return encode_bmp(img)


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


# --------------------------------------------------------------------------
# AVI: RIFF container, uncompressed 24-bit DIB video frames ('DIB ' handler)
# Public layout: MainAVIHeader ('avih') + AVISTREAMHEADER ('strh') +
# BITMAPINFOHEADER ('strf') inside LIST 'hdrl', raw '00db' DIB chunks
# inside LIST 'movi'.  Frames share BMP's pixel layout (bottom-up BGR
# rows, 4-byte padding), so the demux reuses the BMP row math.
# --------------------------------------------------------------------------


_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi(
    frames: np.ndarray, fps: int = 10, codec: str = "dib", quality: int = 85
) -> bytes:
    """(F, H, W, 3) uint8 RGB -> AVI bytes.

    ``codec="dib"``: uncompressed 24-bit DIB frames (``00db`` chunks).
    ``codec="mjpg"``: Motion-JPEG — each frame is a baseline JPEG
    (functions/jpeg.py) in a ``00dc`` chunk, biCompression='MJPG'."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise CodecError("encode_avi expects (F, H, W, 3) uint8")
    if codec not in ("dib", "mjpg"):
        raise CodecError("codec must be 'dib' or 'mjpg'")
    f, h, w, _ = frames.shape
    if f == 0 or fps <= 0:
        raise CodecError("encode_avi needs >= 1 frame and fps > 0")
    row_bytes = (w * 3 + 3) & ~3
    if codec == "dib":
        frame_size = row_bytes * h
        rows = np.zeros((f, h, row_bytes), dtype=np.uint8)
        rows[:, :, : w * 3] = frames[:, ::-1, :, ::-1].reshape(f, h, w * 3)
        payloads = [rows[i].tobytes() for i in range(f)]
        handler, comp, frame_cid = b"DIB ", 0, b"00db"
    else:
        from .jpeg import encode_jpeg

        payloads = [encode_jpeg(frames[i], quality=quality) for i in range(f)]
        frame_size = max(len(p) for p in payloads)
        handler, comp, frame_cid = b"MJPG", _MJPG_FOURCC, b"00dc"

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, f, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", handler, 0, 0, 0, 0, 1, fps, 0, f,
        frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_size, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    strl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) \
        + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(frame_cid, p) for p in payloads)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes | memoryview) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((F, H, W, 3) uint8 RGB frames, fps).  Supports one
    'vids' stream of uncompressed 24-bit DIB ('00db') frames or
    Motion-JPEG ('MJPG' compression, baseline JPEG '00dc' frames)."""
    buf = bytes(payload)
    if len(buf) < 24 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise CodecError("not an AVI payload")
    w = h = None
    fps = 0
    mjpg = False
    cur_stream = b""  # fccType of the most recent strh (strf follows it)
    frames: list[np.ndarray] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, fps, cur_stream, mjpg
        pos = lo
        while pos + 8 <= hi:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_lo, body_hi = pos + 8, min(pos + 8 + size, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif cid == b"avih":
                usec, _, _, _, _, _, _, _, aw, ah = struct.unpack(
                    "<10I", buf[body_lo : body_lo + 40]
                )
                # avih dims are advisory (many real muxers write 0 here);
                # the video strf's biWidth/biHeight below is authoritative
                if aw and ah:
                    w, h = int(aw), int(ah)
                if usec:
                    fps = round(1_000_000 / usec)
            elif cid == b"strh":
                fcc, handler, _, _, _, _, scale, rate = struct.unpack(
                    "<4s4sIHHIII", buf[body_lo : body_lo + 28]
                )
                cur_stream = fcc
                # only the VIDEO stream's rate/scale is the frame rate —
                # an audio strh would otherwise overwrite fps with the
                # sample rate
                if fcc == b"vids" and scale:
                    fps = round(rate / scale)
            elif cid == b"strf" and cur_stream == b"vids":
                _, bw, bh, _, bpp, comp = struct.unpack(
                    "<IiiHHI", buf[body_lo : body_lo + 20]
                )
                if comp == _MJPG_FOURCC:
                    mjpg = True
                elif bpp != 24 or comp != 0:
                    raise CodecError(
                        f"unsupported AVI video stream (bpp={bpp}, compression={comp})"
                    )
                # authoritative frame dims for row math (negative biHeight
                # = top-down DIB; this encoder subset is bottom-up only)
                if bw and bh:
                    w, h = int(bw), int(abs(bh))
            elif cid[2:4] in (b"db", b"dc"):
                if mjpg:
                    from .jpeg import decode_jpeg

                    frames.append(decode_jpeg(buf[body_lo:body_hi]))
                else:
                    if w is None or h is None:
                        raise CodecError("AVI frame chunk before header")
                    row_bytes = (w * 3 + 3) & ~3
                    if body_hi - body_lo < row_bytes * h:
                        raise CodecError("truncated AVI frame")
                    rows = np.frombuffer(
                        buf, dtype=np.uint8, count=row_bytes * h, offset=body_lo
                    ).reshape(h, row_bytes)
                    frames.append(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1])
            pos += 8 + size + (size & 1)

    try:
        walk(12, len(buf))
    except struct.error as e:
        raise CodecError(f"truncated AVI header: {e}") from e
    if not frames:
        raise CodecError("AVI contains no decodable frames")
    try:
        stacked = np.stack(frames)
    except ValueError as e:  # MJPEG frames with inconsistent dims
        raise CodecError(f"inconsistent AVI frame dimensions: {e}") from e
    return np.ascontiguousarray(stacked), int(fps)
