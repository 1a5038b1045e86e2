"""Dependency-free raster codec: 24-bit uncompressed BMP, binary PPM
(P6), and non-interlaced 8-bit PNG (RGB/RGBA, all five scanline filters;
stdlib zlib) — the ``mode="real"`` backing for the multimodal
decode/resize stages (no PIL/ffmpeg in this environment; JPEG/video
remain a declared stub boundary). Formats per the public specs:
BITMAPFILEHEADER/BITMAPINFOHEADER (Windows BMP), netpbm P6, and the PNG
spec (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, 4-byte row padding
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB. Handles
    bottom-up and top-down (negative height) rows and 4-byte padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> (h, w, 3) uint8 RGB. Supports comments
    and arbitrary whitespace in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM payload")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit color type 2, filter 0
    per scanline, single IDAT)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = px.shape
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)  # leading 0 = filter None
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter_row(ft: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline in place per the PNG filter spec. `row`
    is the filtered bytes (mutated to reconstructed), `prev` the
    reconstructed prior scanline (zeros for the first)."""
    if ft == 0:  # None
        return row
    if ft == 2:  # Up
        row += prev
        return row
    if ft == 1:  # Sub — wrapping cumulative sum per byte lane
        np.add.accumulate(row.reshape(-1, bpp), axis=0, dtype=np.uint8, out=row.reshape(-1, bpp))
        return row
    n = len(row)
    if ft == 3:  # Average — left dependency: walk pixels, vector over lanes
        row[:bpp] += prev[:bpp] // 2
        for x in range(bpp, n, bpp):
            left = row[x - bpp : x].astype(np.uint16)
            up = prev[x : x + bpp].astype(np.uint16)
            row[x : x + bpp] += ((left + up) // 2).astype(np.uint8)
        return row
    if ft == 4:  # Paeth
        row[:bpp] += prev[:bpp]
        for x in range(bpp, n, bpp):
            a = row[x - bpp : x].astype(np.int16)
            b = prev[x : x + bpp].astype(np.int16)
            c = prev[x - bpp : x].astype(np.int16)
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            row[x : x + bpp] += pred.astype(np.uint8)
        return row
    raise ValueError(f"unknown PNG filter type {ft}")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Supports 8-bit depth, color
    types 2 (RGB) and 6 (RGBA — alpha dropped), non-interlaced, any mix
    of the five scanline filters, multiple IDAT chunks.

    Exception contract (untrusted 100-TB inputs hit actor pools — a
    corrupt payload must fail with the DECLARED type, never an internal
    zlib/struct leak): any malformed stream raises ``ValueError``;
    well-formed-but-unsupported shapes raise ``NotImplementedError``."""
    try:
        return _decode_png_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (zlib.error, struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed PNG stream: {type(e).__name__}: {e}") from e


def _decode_png_impl(payload: bytes) -> np.ndarray:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG: depth={depth} color={ctype} "
                    f"interlace={interlace} (8-bit RGB/RGBA non-interlaced only)"
                )
            bpp = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * bpp
    if len(raw) < stride * h:
        raise ValueError("truncated PNG pixel data")
    lines = raw[: stride * h].reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = lines[y, 1:].copy()
        prev = _png_unfilter_row(int(lines[y, 0]), row, prev, bpp)
        out[y] = prev
    px = out.reshape(h, w, bpp)
    return px[:, :, :3].copy() if bpp == 4 else px


def decode_raster(payload: bytes, media_type: str | None = None) -> np.ndarray:
    """Decode by media type, or sniff magic bytes when absent."""
    if media_type == "image/bmp" or (media_type is None and payload[:2] == b"BM"):
        return decode_bmp(payload)
    if media_type == "image/png" or (
        media_type is None and payload[:8] == _PNG_SIG
    ):
        return decode_png(payload)
    if media_type == "image/x-portable-pixmap" or (
        media_type is None and payload[:2] == b"P6"
    ):
        return decode_ppm(payload)
    if media_type in ("image/jpeg", "image/jpg") or (
        media_type is None and payload[:2] == b"\xff\xd8"
    ):
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"no dependency-free decoder for {media_type or 'unknown payload'}"
        " (video frame extraction needs ffmpeg — declared stub boundary)"
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — deterministic
    (sample-at-center index map, matching common NN implementations)."""
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    yi = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return px[yi][:, xi]


def raster_features(pixels: np.ndarray) -> np.ndarray:
    """8-dim summary feature for a decoded raster: per-channel mean and
    std (RGB, /255), luma mean, and log2 aspect ratio."""
    px = np.asarray(pixels, dtype=np.float64) / 255.0
    h, w = px.shape[:2]
    means = px.reshape(-1, 3).mean(axis=0)
    stds = px.reshape(-1, 3).std(axis=0)
    luma = float(means @ np.array([0.2126, 0.7152, 0.0722]))
    return np.array(
        [*means, *stds, luma, float(np.log2(w / h))], dtype=np.float64
    )


# -- baseline JPEG (ITU T.81 baseline sequential, JFIF) ----------------------
#
# Decoder: baseline DCT, 8-bit, non-progressive, no chroma subsampling
# (4:4:4 or grayscale), DRI/RST supported. Tables (DQT/DHT) always come
# from the FILE, so external baseline JPEGs decode with their own tables.
# Encoder: 4:4:4 with the T.81 Annex K example tables — used to generate
# real-format streams for tests and the multimodal fixtures.

_ZZ = np.empty(64, dtype=np.int64)  # zigzag index k -> raster index r*8+c
_k = 0
for _s in range(15):
    _rng = range(max(0, _s - 7), min(7, _s) + 1)
    for _r in (_rng if _s % 2 else reversed(_rng)):
        _ZZ[_k] = _r * 8 + (_s - _r)
        _k += 1
del _k, _s, _rng

_DCT_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _DCT_C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _a, _x

# T.81 Annex K example tables (public standard)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_canonical(bits: list[int], vals: list[int]):
    """(bits[1..16], values) -> {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _huff_encode_map(bits: list[int], vals: list[int]):
    """symbol -> (code, length) for the encoder."""
    return {v: (c, l) for (l, c), v in _huff_canonical(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """Reads the (already de-stuffed) entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def receive_extend(self, t: int) -> int:
        if t == 0:
            return 0
        v = self.bits(t)
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, extra bits) per T.81 F.1.2."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    extra = v if v >= 0 else v + (1 << t) - 1
    return t, extra


def encode_jpeg(pixels: np.ndarray, quality_scale: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes, 4:4:4, Annex K tables
    (optionally scaled coarser by ``quality_scale``). Exists to generate
    real-format streams for the decoder's tests/fixtures."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = px.shape
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qts = [
        np.clip(_QT_LUMA * quality_scale, 1, 255),
        np.clip(_QT_CHROMA * quality_scale, 1, 255),
    ]
    hb, wb = -(-h // 8), -(-w // 8)
    planes = []
    for plane in (y, cb, cr):
        p = np.full((hb * 8, wb * 8), 128.0)
        p[:h, :w] = plane
        # edge replicate so padding doesn't ring
        p[:h, w:] = p[:h, w - 1 : w]
        p[h:, :] = p[h - 1 : h, :]
        planes.append(p)

    dc_maps = [
        _huff_encode_map(_DC_L_BITS, _DC_L_VALS),
        _huff_encode_map(_DC_C_BITS, _DC_C_VALS),
    ]
    ac_maps = [
        _huff_encode_map(_AC_L_BITS, _AC_L_VALS),
        _huff_encode_map(_AC_C_BITS, _AC_C_VALS),
    ]
    bw = _BitWriter()
    preds = [0, 0, 0]
    for by in range(hb):
        for bx in range(wb):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                blk = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = _DCT_C @ blk @ _DCT_C.T
                q = np.round(f / qts[ti]).astype(np.int64)
                zz = q.ravel()[_ZZ]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t, extra = _magnitude(diff)
                code, ln = dc_maps[ti][t]
                bw.write(code, ln)
                if t:
                    bw.write(extra, t)
                nz = np.nonzero(zz[1:])[0]
                prev = 0
                for i in nz:
                    run = int(i) - prev
                    prev = int(i) + 1
                    while run >= 16:
                        code, ln = ac_maps[ti][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t, extra = _magnitude(int(zz[1 + i]))
                    code, ln = ac_maps[ti][(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(extra, t)
                if prev < 63:
                    code, ln = ac_maps[ti][0x00]  # EOB
                    bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in enumerate(qts):
        out += seg(
            0xDB,
            bytes([tq]) + bytes(int(v) for v in qt.ravel()[_ZZ]),
        )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xC0, sof)
    for tc_th, bits, vals in (
        (0x00, _DC_L_BITS, _DC_L_VALS),
        (0x10, _AC_L_BITS, _AC_L_VALS),
        (0x01, _DC_C_BITS, _DC_C_VALS),
        (0x11, _AC_C_BITS, _AC_C_VALS),
    ):
        out += seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Supports baseline DCT
    (SOF0), 8-bit, 4:4:4 or grayscale, DRI/RST, multi-table DQT/DHT
    segments; tables come from the file. Progressive (SOF2) and chroma
    subsampling raise NotImplementedError — declared boundary.

    Exception contract (same as ``decode_png``): malformed/truncated
    streams raise ``ValueError`` — internal huffman/bit-reader errors
    (IndexError, KeyError, StopIteration, …) never escape the decoder,
    so actor-pool stages over untrusted payloads can catch precisely."""
    try:
        return _decode_jpeg_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (
        IndexError,
        KeyError,
        OverflowError,
        StopIteration,
        struct.error,
        zlib.error,
    ) as e:
        raise ValueError(f"malformed JPEG stream: {type(e).__name__}: {e}") from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    h = w = None
    restart = 0
    scan_comps: list[tuple[int, int, int]] = []
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt = np.zeros(64, np.int32)
                qt[_ZZ] = vals
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                tab = _huff_canonical(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            depth, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma-subsampled JPEG (sampling != 4:4:4) — "
                        "declared boundary"
                    )
                comps.append((cid, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            scan_start = pos
            break
    if h is None or scan_start is None:
        raise ValueError("JPEG missing SOF/SOS")

    # de-stuff the entropy-coded segment, splitting at RST markers
    data = bytearray()
    rst_breaks = []
    i = scan_start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if m == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RST
                rst_breaks.append(len(data))
                i += 2
                continue
            break  # real marker (EOI or next segment)
        data.append(b)
        i += 1

    n_comp = len(comps)
    hb, wb = -(-h // 8), -(-w // 8)
    n_mcu = hb * wb
    coefs = [np.zeros((n_mcu, 64), dtype=np.int32) for _ in range(n_comp)]
    comp_tabs = []
    for cid, _tq in comps:
        sel = next(sc for sc in scan_comps if sc[0] == cid)
        comp_tabs.append((dc_tabs[sel[1]], ac_tabs[sel[2]]))

    br = _BitReader(bytes(data))
    preds = [0] * n_comp
    seg_idx = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            # resync: next RST boundary, reset predictors. A file can
            # declare DRI yet emit fewer RST markers than restart
            # intervals — fail with the decoder's ValueError contract
            # instead of an IndexError out of the actor.
            if seg_idx >= len(rst_breaks):
                raise ValueError(
                    "corrupt JPEG: DRI declared but entropy stream has "
                    f"only {len(rst_breaks)} RST markers"
                )
            br = _BitReader(bytes(data[rst_breaks[seg_idx]:]))
            seg_idx += 1
            preds = [0] * n_comp
        for ci in range(n_comp):
            dct, act = comp_tabs[ci]
            t = br.huff(dct)
            preds[ci] += br.receive_extend(t)
            row = coefs[ci][m]
            row[0] = preds[ci]
            k = 1
            while k < 64:
                rs = br.huff(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                if k > 63:
                    # a crafted AC run can push the coefficient index
                    # past the 8x8 block — ValueError, not IndexError
                    raise ValueError(
                        "corrupt JPEG: AC coefficient index > 63"
                    )
                row[_ZZ[k]] = br.receive_extend(s)
                k += 1

    # vectorized dequant + IDCT over all blocks per component
    planes = []
    for ci, (cid, tq) in enumerate(comps):
        f = coefs[ci].reshape(n_mcu, 8, 8) * qts[tq][None, :, :]
        blocks = np.einsum("ux,nuv,vy->nxy", _DCT_C, f.astype(np.float64), _DCT_C)
        plane = blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(
            hb * 8, wb * 8
        )
        planes.append(plane[:h, :w] + 128.0)
    if n_comp == 1:
        yp = np.clip(planes[0], 0, 255)
        return np.repeat(yp[:, :, None], 3, axis=2).astype(np.uint8)
    yp, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = yp + 1.402 * cr
    g = yp - 0.344136 * cb - 0.714136 * cr
    b = yp + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# -- MJPEG-in-AVI container (RIFF, Microsoft AVI 1.0) -------------------------
# The video analog stays dependency-free: frames are baseline JPEGs in
# '00dc' chunks inside the standard RIFF/LIST structure, so the sampler
# below reads real AVI files written by MJPEG encoders and the encoder
# exists to generate real-format streams for tests/fixtures (same
# pattern as encode_jpeg).


def encode_mjpeg_avi(frames: list, fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal but structurally
    valid RIFF AVI (avih + vids/MJPG strh/strf headers, LIST movi with
    one '00dc' JPEG chunk per frame, idx1)."""
    import struct

    if not frames:
        raise ValueError("no frames")
    jpegs = [encode_jpeg(f) for f in frames]
    h, w = np.asarray(frames[0]).shape[:2]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + len(data).to_bytes(4, "little") + data + (
            b"\x00" if len(data) % 2 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_sz = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_sz * fps, 0, 0x10, len(jpegs), 0, 1,
        max_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(jpegs), max_sz, 0xFFFFFFFF & (2**32 - 1), 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, int(w), int(h), 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: (fourcc, flags, offset-from-movi-kind, size) per frame
    idx_entries, off = [], 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def mjpeg_avi_frames(payload: bytes) -> list:
    """RIFF AVI bytes -> [(byte_offset, jpeg_bytes)] for every video
    frame ('..dc') chunk, in stream order. Walks the LIST tree; offsets
    are absolute into ``payload`` (the chunk body start)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list = []
    # iterative LIST-tree walk: a crafted payload can nest LIST chunks
    # thousands deep (8 bytes buys a level), so recursion would hit
    # RecursionError instead of the declared ValueError contract
    stack = [(12, len(payload))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if body + size > len(payload):
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                stack.append((body + size + (size & 1), end))
                pos, end = body + 4, body + size
                continue
            if fourcc[2:4] == b"dc":
                frames.append((body, bytes(payload[body : body + size])))
            pos = body + size + (size & 1)
    return frames
