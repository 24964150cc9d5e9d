"""Pure-NumPy baseline JPEG (JFIF) encoder + decoder.

Closes the "compressed media codecs" gap: the multimodal stages
(stages/multimodal.py) take a decoder callable, and until this module
only header+raw formats (BMP/WAV/AVI) shipped.  Baseline sequential
JPEG is implementable without external libraries: 8x8 DCT-II via one
matrix product, quantization with the Annex-K tables, zigzag
run-length coding and canonical Huffman over a bit-stuffed stream.

Scope (spec: ITU-T T.81 baseline sequential DCT, JFIF container):

* encoder — 8-bit RGB or grayscale, 4:4:4 (no chroma subsampling),
  Annex-K quantization tables scaled by libjpeg's quality formula,
  Annex-K Huffman tables;
* decoder — baseline SOF0 streams with 4:4:4, 4:2:0 (2x2 luma
  sampling) or single-component grayscale, restart intervals (DRI /
  RSTn), any valid DQT/DHT (tables are read from the stream, not
  assumed).  Progressive (SOF2) and arithmetic coding raise
  ``CodecError``.

The per-symbol Huffman walk is a Python loop over a 16-bit prefix LUT
(O(1) per symbol); everything block-shaped — color transform, DCT/IDCT,
quantization, zigzag — is vectorized over all blocks at once.  In the
pipeline this runs inside the multimodal actor pool where the
per-payload loop is inherent to codec work (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

# --------------------------------------------------------------------------
# constants: zigzag order, Annex-K quantization + Huffman tables
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex-K Huffman specs: (bits-per-length[1..16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: dct2d(B) = D @ B @ D.T
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    _D[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)
del _u, _c


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: 5000/Q below 50, 200-2Q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = np.floor((base * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffLUT:
    """16-bit-prefix lookup: peek 16 bits -> (symbol, code length)."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits: list[int], vals: list[int]):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.ln = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                if hi > (1 << 16):
                    raise CodecError("overfull Huffman table")
                self.sym[lo:hi] = vals[k]
                self.ln[lo:hi] = length
                code += 1
                k += 1
            code <<= 1


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over an un-stuffed entropy segment."""

    __slots__ = ("bits", "pos", "_pow16", "n")

    def __init__(self, data: np.ndarray):
        self.bits = np.unpackbits(data)
        self.n = len(self.bits)
        self.pos = 0
        self._pow16 = (1 << np.arange(15, -1, -1)).astype(np.int64)

    def peek16(self) -> int:
        if self.pos >= self.n:
            raise CodecError("truncated entropy segment")
        end = min(self.pos + 16, self.n)
        window = self.bits[self.pos : end].astype(np.int64)
        # leading powers already place a short tail window in the high bits
        return int(window @ self._pow16[: end - self.pos])

    def skip(self, k: int) -> None:
        self.pos += k

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if k > 16:  # baseline magnitude categories are <= 16 bits
            raise CodecError("invalid magnitude size")
        if self.pos + k > self.n:
            raise CodecError("truncated entropy segment")
        window = self.bits[self.pos : self.pos + k].astype(np.int64)
        self.pos += k
        return int(window @ self._pow16[16 - k :])


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per the JPEG magnitude category coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H and W multiples of 8 -> (n, 8, 8) row-major blocks."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    diff = int(blk[0]) - pred
    size, bits = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.put(code, ln)
    bw.put(bits, size)
    nz = np.flatnonzero(blk[1:])
    run = 0
    prev = 0
    for pos in nz:
        run += int(pos) - prev
        prev = int(pos) + 1
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(int(blk[1 + pos]))
        code, ln = ac_tab[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if len(nz) == 0 or int(nz[-1]) != 62:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)
    return int(blk[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 grayscale -> baseline JFIF bytes
    (Annex-K quantization/Huffman tables).

    ``subsample``: ``"444"`` (one block per component per MCU) or
    ``"420"`` (2x2 luma sampling, chroma mean-pooled 2x2).
    ``restart_interval``: emit DRI + RSTn every that many MCUs (0 = off).
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise CodecError("encode_jpeg expects (H, W[, 3]) uint8")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise CodecError("encode_jpeg expects 3 channels for color input")
    if subsample not in ("444", "420"):
        raise CodecError("subsample must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise CodecError("degenerate image dimensions")
    qt_l, qt_c = _quality_tables(quality)
    sub420 = subsample == "420" and not gray
    hs = vs = 2 if sub420 else 1
    mcu_px = 8 * hs

    # pad to the MCU grid | replicate edges (standard practice; crop on decode)
    ph = -(-h // mcu_px) * mcu_px
    pw = -(-w // mcu_px) * mcu_px
    padded = np.pad(img, [(0, ph - h), (0, pw - w)] + ([(0, 0)] if not gray else []), mode="edge")
    if gray:
        planes = [padded.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(padded)
        planes = list(np.moveaxis(ycc, -1, 0))
        if sub420:  # mean-pool chroma 2x2
            for ci in (1, 2):
                p = planes[ci]
                planes[ci] = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    # vectorized DCT + quantize + zigzag for every component
    coefs = []
    for ci, plane in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        blocks = _to_blocks(plane - 128.0)
        freq = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        q = np.round(freq.reshape(-1, 64) / qt[None, :]).astype(np.int32)
        coefs.append(q[:, ZIGZAG])

    mcus_x, mcus_y = pw // mcu_px, ph // mcu_px
    n_mcus = mcus_x * mcus_y
    # per-component block indices in MCU scan order
    orders = []
    for ci in range(len(planes)):
        chs, cvs = (hs, vs) if ci == 0 else (1, 1)
        bw_blocks = mcus_x * chs
        my, mx = np.divmod(np.arange(n_mcus), mcus_x)
        # blocks inside an MCU scan row-major (v, h)
        idx = (
            (my[:, None] * cvs + np.arange(cvs).repeat(chs)[None, :]) * bw_blocks
            + mx[:, None] * chs
            + np.tile(np.arange(chs), cvs)[None, :]
        )
        orders.append(idx)  # (n_mcus, chs*cvs)

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    parts: list[bytes] = []
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for mi in range(n_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            parts.append(bw.flush())
            parts.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(planes)
        for ci in range(len(planes)):
            dc_tab, ac_tab = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for bi in orders[ci][mi]:
                preds[ci] = _encode_block(bw, coefs[ci][bi], preds[ci], dc_tab, ac_tab)
    parts.append(bw.flush())
    entropy = b"".join(parts)

    # --- container segments ---
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0x00]) + bytes(qt_l[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qt_c[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        samp = (hs << 4) | vs if ci == 0 else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)  # SOF0 baseline
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes | memoryview) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (grayscale replicated).

    Supports SOF0 with 4:4:4, 4:2:0 or single-component scans and
    restart intervals; tables come from the stream's own DQT/DHT.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise CodecError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffLUT] = {}
    restart_interval = 0
    frame = None
    scan = None
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise CodecError("marker sync lost")
        marker = int(buf[pos + 1])
        if marker == 0xD9:  # EOI before SOS
            break
        length = (int(buf[pos + 2]) << 8) | int(buf[pos + 3])
        body = buf[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise CodecError("truncated JPEG segment")
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = int(body[o]) >> 4, int(body[o]) & 0xF
                if pq != 0:
                    raise CodecError("16-bit quantization tables unsupported")
                qt[tq] = body[o + 1 : o + 65].astype(np.float64)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = int(body[o]) >> 4, int(body[o]) & 0xF
                bits = [int(b) for b in body[o + 1 : o + 17]]
                nv = sum(bits)
                if o + 17 + nv > len(body):
                    raise CodecError("truncated DHT segment")
                vals = [int(v) for v in body[o + 17 : o + 17 + nv]]
                huff[(cls, tid)] = _HuffLUT(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = (int(body[0]) << 8) | int(body[1])
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6].tobytes())
            if prec != 8:
                raise CodecError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid = int(body[6 + 3 * ci])
                samp = int(body[7 + 3 * ci])
                comps.append((cid, samp >> 4, samp & 0xF, int(body[8 + 3 * ci])))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError("non-baseline JPEG (progressive/arithmetic) unsupported")
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = int(body[0])
            scan = [(int(body[1 + 2 * i]), int(body[2 + 2 * i]) >> 4, int(body[2 + 2 * i]) & 0xF) for i in range(ns)]
            break
    if frame is None or scan is None:
        raise CodecError("missing SOF/SOS")
    fh, fw, comps = frame

    # entropy segment runs to EOI; split on RST markers, un-stuff 0xFF00
    end = n - 2
    while end > pos and not (buf[end] == 0xFF and buf[end + 1] == 0xD9):
        end -= 1
    data = buf[pos:end]
    ff = np.flatnonzero(data[:-1] == 0xFF)
    nxt = data[ff + 1]
    if np.any((nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD7))):
        raise CodecError("unexpected marker inside entropy data")
    # segment boundaries at RST markers
    rst_at = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    bounds = [0] + [int(r) for r in rst_at] + [len(data)]
    segments = []
    for i in range(len(bounds) - 1):
        lo = bounds[i] + (2 if i > 0 else 0)
        seg_bytes = data[lo : bounds[i + 1]]
        stuff = np.flatnonzero(seg_bytes[:-1] == 0xFF) + 1
        keep = np.ones(len(seg_bytes), dtype=bool)
        keep[stuff[seg_bytes[stuff] == 0x00]] = False
        segments.append(seg_bytes[keep])

    # geometry
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if (hmax, vmax) not in ((1, 1), (2, 2)) or any(
        (c[1], c[2]) not in ((1, 1), (hmax, vmax)) for c in comps
    ):
        raise CodecError("only 4:4:4, 4:2:0 or grayscale sampling supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h
    n_mcus = mcus_x * mcus_y

    comp_info = []
    for (cid, hs, vs, tq), (sid, dc_id, ac_id) in zip(comps, scan):
        if sid != cid:
            raise CodecError("scan/frame component mismatch")
        if tq not in qt or (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise CodecError("missing quantization/Huffman table")
        comp_info.append(
            {
                "h": hs, "v": vs, "qt": qt[tq],
                "dc": huff[(0, dc_id)], "ac": huff[(1, ac_id)],
                "coef": np.zeros((n_mcus * hs * vs, 64), dtype=np.float64),
            }
        )

    # Huffman-decode every MCU (restart segments reset DC predictors)
    mcu = 0
    for seg_bytes in segments:
        br = _BitReader(seg_bytes)
        preds = [0] * len(comp_info)
        limit = mcu + restart_interval if restart_interval else n_mcus
        while mcu < min(limit, n_mcus):
            for ci, info in enumerate(comp_info):
                for b in range(info["h"] * info["v"]):
                    blk = info["coef"][mcu * info["h"] * info["v"] + b]
                    lut = info["dc"]
                    p16 = br.peek16()
                    ln = int(lut.ln[p16])
                    if ln == 0:
                        raise CodecError("invalid Huffman code (DC)")
                    br.skip(ln)
                    size = int(lut.sym[p16])
                    diff = _extend(br.read(size), size)
                    preds[ci] += diff
                    blk[0] = preds[ci]
                    k = 1
                    lut = info["ac"]
                    while k < 64:
                        p16 = br.peek16()
                        ln = int(lut.ln[p16])
                        if ln == 0:
                            raise CodecError("invalid Huffman code (AC)")
                        br.skip(ln)
                        sym = int(lut.sym[p16])
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0xF
                        k += run
                        if size == 0:
                            if run != 15:
                                raise CodecError("invalid AC run")
                            k += 1
                            continue
                        if k > 63:
                            raise CodecError("AC index overflow")
                        blk[k] = _extend(br.read(size), size)
                        k += 1
            mcu += 1
    if mcu < n_mcus:
        raise CodecError("truncated scan: missing MCUs")

    # vectorized dequantize + IDCT + assembly per component
    planes = []
    for info in comp_info:
        hs, vs = info["h"], info["v"]
        c = info["coef"] * info["qt"][None, :]
        blocks = c[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        # blocks are in MCU order: (mcu, vs, hs) row-major inside each MCU
        bw_ = mcus_x * hs
        bh_ = mcus_y * vs
        grid = pix.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
        plane = grid.transpose(0, 2, 4, 1, 3, 5).reshape(bh_ * 8, bw_ * 8)
        if hs < hmax:  # 4:2:0 chroma -> upsample 2x nearest
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[: mcus_y * mcu_h, : mcus_x * mcu_w])

    if len(planes) == 1:
        y = np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)[:fh, :fw]
        return np.repeat(y[:, :, None], 3, axis=2)
    ycc = np.stack(planes, axis=-1)[:fh, :fw]
    return _ycbcr_to_rgb(ycc)
