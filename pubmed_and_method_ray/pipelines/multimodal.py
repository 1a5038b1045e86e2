"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted in actor-pool map_batches stages.

``mode='real'`` decode/resize runs on the dependency-free numpy raster
codec (24-bit BMP, P6 PPM, 8-bit PNG, baseline JPEG —
functions/raster.py) — genuinely exercisable in this container. Video
frame extraction remains the one DECLARED stub boundary
(NotImplementedError: it needs ffmpeg, absent here); ``mode='fake'``
produces a deterministic
content-hash stand-in so the oracle-checked plumbing — binary schema,
small batch sizes for large payloads, actor signature, output layout —
is testable on any payload. Swap ``decode_raster`` for a PIL/ffmpeg
call on a full cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..sources.io import read_parquet_clean

PAYLOAD_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),       # opaque media bytes
        pa.field("media_type", pa.string()),    # 'image/png' etc. (typed metadata)
        pa.field("payload_bytes", pa.int64()),
    ]
)


def payload_meta(sf_dir: str):
    """documents.text treated as an opaque binary payload: size + md5.
    (Oracle-checkable: octet_length + md5.)"""
    import ray.data as rd
    def f(t: pa.Table) -> pa.Table:
        raw = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "payload_bytes": pa.array([len(b) for b in raw], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(b).hexdigest() for b in raw], pa.string()
                ),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder: (width, height, 8-dim feature) keyed by
    content hash — stands in for PIL.Image.open + a feature extractor.
    md5-keyed so the DuckDB oracle (byte-slices of md5(text)) matches."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0
    return width, height, feat[:8]


class DecodePayload:
    """Actor-pool decode stage. ``mode='real'`` decodes actual rasters
    with the dependency-free numpy codec (24-bit BMP, P6 PPM, 8-bit
    PNG, baseline JPEG — functions/raster.py; MJPEG-in-AVI video frames
    via SampleFrames). ``mode='fake'`` runs the deterministic
    content-hash fake so the oracle-checked plumbing is independent of
    payload format. Keep batch_size small — payload rows are wide."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("real", "fake"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        # payload metadata rides along (payload_meta's kernel, carried
        # here so size+digest sit in the same driver-certified query)
        payloads = [p or b"" for p in t["payload"].to_pylist()]
        meta = {
            "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "payload_md5": pa.array(
                [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
            ),
        }
        widths, heights, feats = [], [], []
        if self.mode == "real":
            from ..functions.raster import decode_raster, raster_features

            media = (
                t["media_type"].to_pylist()
                if "media_type" in t.schema.names
                else [None] * t.num_rows
            )
            for payload, mt in zip(payloads, media):
                px = decode_raster(payload, mt)
                h, w = px.shape[:2]
                widths.append(w)
                heights.append(h)
                feats.append(raster_features(px))
        else:
            for payload in payloads:
                w, h, f = _fake_decode(payload)
                widths.append(w)
                heights.append(h)
                feats.append(f)
        cols = {
            "doc_id": t["doc_id"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
        # 8 scalar feature columns (f0..f7): oracle- and schema-friendly
        # (flat double columns instead of a fixed-size list)
        F = np.stack(feats) if feats else np.zeros((0, 8))
        for j in range(8):
            cols[f"f{j}"] = pa.array(F[:, j], pa.float64())
        cols.update(meta)
        return pa.Table.from_pydict(cols)


class ResizePayload:
    """Actor-pool resize stage (image-resize analog). ``real`` mode
    decodes with the numpy raster codec, nearest-neighbor resizes, and
    checksums the resized RGB buffer; ``fake`` emits deterministic
    target dims + a content-keyed checksum so the oracle-checked
    plumbing (schema in/out, batch sizing) is payload-format-free."""

    def __init__(self, width: int = 224, height: int = 224, mode: str = "fake"):
        if mode not in ("real", "fake"):
            raise ValueError(mode)
        self.w, self.h, self.mode = width, height, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            from ..functions.raster import decode_raster, resize_nearest

            media = (
                t["media_type"].to_pylist()
                if "media_type" in t.schema.names
                else [None] * t.num_rows
            )
            sums = []
            for payload, mt in zip(t["payload"].to_pylist(), media):
                px = resize_nearest(
                    decode_raster(payload or b"", mt), self.w, self.h
                )
                sums.append(hashlib.md5(px.tobytes()).hexdigest()[:16])
            n = t.num_rows
            return pa.Table.from_pydict(
                {
                    "doc_id": t["doc_id"],
                    "width": pa.array([self.w] * n, pa.int32()),
                    "height": pa.array([self.h] * n, pa.int32()),
                    "resized_checksum": pa.array(sums, pa.string()),
                }
            )
        sums = []
        for payload in t["payload"].to_pylist():
            # md5 over payload || ':WxH' — DuckDB: md5(text || ':224x224')
            h = hashlib.md5(
                (payload or b"") + f":{self.w}x{self.h}".encode("utf-8")
            )
            sums.append(h.hexdigest()[:16])
        n = t.num_rows
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "width": pa.array([self.w] * n, pa.int32()),
                "height": pa.array([self.h] * n, pa.int32()),
                "resized_checksum": pa.array(sums, pa.string()),
            }
        )


class SampleFrames:
    """Actor-pool frame-sampling stage (video analog): emits ``n_frames``
    evenly spaced frame records per payload (flat_map shape — one input
    row becomes several output rows). ``mode='real'`` parses MJPEG-in-AVI
    payloads with the dependency-free RIFF walker + baseline JPEG decoder
    (functions/raster.py) — byte_offset is the real '00dc' chunk offset
    and frame_checksum hashes the DECODED pixels; compressed codecs
    (H.264 etc.) would need ffmpeg and raise from decode_jpeg.
    ``mode='fake'`` keeps the deterministic content-hash fake whose
    oracle checks the plumbing independent of payload format."""

    def __init__(self, n_frames: int = 4, mode: str = "fake"):
        if mode not in ("real", "fake"):
            raise ValueError(mode)
        self.n_frames, self.mode = n_frames, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            from ..functions.raster import decode_jpeg, mjpeg_avi_frames

            doc_ids, frame_idx, offsets, checks = [], [], [], []
            for doc_id, payload in zip(
                t["doc_id"].to_pylist(), t["payload"].to_pylist()
            ):
                frames = mjpeg_avi_frames(payload or b"")
                if not frames:
                    continue
                for i in range(self.n_frames):
                    off, jb = frames[(i * len(frames)) // self.n_frames]
                    px = decode_jpeg(jb)
                    doc_ids.append(doc_id)
                    frame_idx.append(i)
                    offsets.append(off)
                    checks.append(hashlib.md5(px.tobytes()).hexdigest()[:8])
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "frame_idx": pa.array(frame_idx, pa.int32()),
                    "byte_offset": pa.array(offsets, pa.int64()),
                    "frame_checksum": pa.array(checks, pa.string()),
                }
            )
        doc_ids, frame_idx, offsets, checks = [], [], [], []
        for doc_id, payload in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            # char-based frame windows over the decoded payload so the
            # DuckDB oracle (substring + md5 on VARCHAR) matches exactly
            data = (payload or b"").decode("utf-8", errors="replace")
            span = max(len(data), 1)
            for i in range(self.n_frames):
                off = (i * span) // self.n_frames
                doc_ids.append(doc_id)
                frame_idx.append(i)
                offsets.append(off)
                checks.append(
                    hashlib.md5(
                        data[off : off + 16].encode("utf-8")
                    ).hexdigest()[:8]
                )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "byte_offset": pa.array(offsets, pa.int64()),
                "frame_checksum": pa.array(checks, pa.string()),
            }
        )


def decode_features(sf_dir: str, mode: str = "fake"):
    """documents -> payload rows -> actor-pool decode -> typed features."""
    import ray.data as rd

    def to_payload(t: pa.Table) -> pa.Table:
        raw = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(raw, pa.binary()),
                pa.array(["text/plain"] * len(raw), pa.string()),
                pa.array([len(b) for b in raw], pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            DecodePayload,
            fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow",
            batch_size=64,  # large-binary rows: keep batches small
            concurrency=(1, 4),
        )
    )


def _payload_ds(sf_dir: str):
    import ray.data as rd

    def to_payload(t: pa.Table) -> pa.Table:
        raw = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(raw, pa.binary()),
                pa.array(["text/plain"] * len(raw), pa.string()),
                pa.array([len(b) for b in raw], pa.int64()),
            ],
            schema=PAYLOAD_SCHEMA,
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow")


def resize_features(sf_dir: str, mode: str = "fake"):
    """documents -> payload rows -> actor-pool resize -> dims+checksum."""
    return _payload_ds(sf_dir).map_batches(
        ResizePayload,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def frame_samples(sf_dir: str, mode: str = "fake"):
    """documents -> payload rows -> actor-pool frame sampler (1->N rows)."""
    return _payload_ds(sf_dir).map_batches(
        SampleFrames,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )
