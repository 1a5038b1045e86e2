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
    of the five scanline filters, multiple IDAT chunks."""
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
    raise NotImplementedError(
        f"no dependency-free decoder for {media_type or 'unknown payload'}"
        " (JPEG/video need PIL/ffmpeg — declared stub boundary)"
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
