"""Dependency-free raster codec: 24-bit uncompressed BMP and binary PPM
(P6), both pure numpy — the ``mode="real"`` backing for the multimodal
decode/resize stages (no PIL/ffmpeg in this environment; PNG/JPEG remain
a declared stub boundary). Formats per the public specs:
BITMAPFILEHEADER/BITMAPINFOHEADER (Windows BMP) and netpbm P6.
"""

from __future__ import annotations

import struct

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


def decode_raster(payload: bytes, media_type: str | None = None) -> np.ndarray:
    """Decode by media type, or sniff magic bytes when absent."""
    if media_type == "image/bmp" or (media_type is None and payload[:2] == b"BM"):
        return decode_bmp(payload)
    if media_type == "image/x-portable-pixmap" or (
        media_type is None and payload[:2] == b"P6"
    ):
        return decode_ppm(payload)
    raise NotImplementedError(
        f"no dependency-free decoder for {media_type or 'unknown payload'}"
        " (PNG/JPEG/video need PIL/ffmpeg — declared stub boundary)"
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
