"""Multimodal plumbing: payload schema, decode/resize/frame-sample actors
(fake kernels; real decode is a stub boundary)."""

import pyarrow as pa
import pytest

from pubmed_and_method_ray.pipelines.multimodal import (
    DecodePayload,
    ResizePayload,
    SampleFrames,
    decode_features,
    frame_samples,
    resize_features,
)

SF = "/root/testdata/sf0.001"


def _payload_batch(n=5):
    return pa.Table.from_pydict(
        {
            "doc_id": list(range(n)),
            "payload": [f"data{i}".encode() * (i + 1) for i in range(n)],
            "media_type": ["text/plain"] * n,
            "payload_bytes": [5 * (i + 1) for i in range(n)],
        }
    )


def _gradient_rgb(w=13, h=7):
    import numpy as np

    x = np.arange(w, dtype=np.uint8)
    y = np.arange(h, dtype=np.uint8)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = x[None, :] * 17
    px[:, :, 1] = y[:, None] * 31
    px[:, :, 2] = (x[None, :] + y[:, None]) * 7
    return px


def _raster_batch(fmt="bmp", n=4):
    import numpy as np

    from pubmed_and_method_ray.functions.raster import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    payloads, mts = [], []
    for i in range(n):
        px = _gradient_rgb(8 + i, 5 + i)
        if fmt == "bmp":
            payloads.append(encode_bmp(px))
            mts.append("image/bmp")
        elif fmt == "png":
            payloads.append(encode_png(px))
            mts.append("image/png")
        else:
            payloads.append(encode_ppm(px))
            mts.append("image/x-portable-pixmap")
    return pa.Table.from_pydict(
        {
            "doc_id": list(range(n)),
            "payload": payloads,
            "media_type": mts,
            "payload_bytes": [len(p) for p in payloads],
        }
    )


class TestRasterCodec:
    def test_bmp_roundtrip(self):
        import numpy as np

        from pubmed_and_method_ray.functions.raster import decode_bmp, encode_bmp

        for w, h in [(1, 1), (3, 2), (13, 7), (16, 16)]:
            px = _gradient_rgb(w, h)
            assert np.array_equal(decode_bmp(encode_bmp(px)), px), (w, h)

    def test_ppm_roundtrip_and_comments(self):
        import numpy as np

        from pubmed_and_method_ray.functions.raster import decode_ppm, encode_ppm

        px = _gradient_rgb(9, 4)
        assert np.array_equal(decode_ppm(encode_ppm(px)), px)
        # header with a comment line
        with_comment = b"P6\n# a comment\n9 4\n255\n" + px.tobytes()
        assert np.array_equal(decode_ppm(with_comment), px)

    def test_resize_nearest_identity_and_downscale(self):
        import numpy as np

        from pubmed_and_method_ray.functions.raster import resize_nearest

        px = _gradient_rgb(10, 6)
        assert np.array_equal(resize_nearest(px, 10, 6), px)
        small = resize_nearest(px, 5, 3)
        assert small.shape == (3, 5, 3)
        # nearest-neighbor: every output pixel exists in the input
        flat_in = {tuple(p) for p in px.reshape(-1, 3)}
        assert all(tuple(p) in flat_in for p in small.reshape(-1, 3))

    def test_bad_payloads_rejected(self):
        import pytest as _pytest

        from pubmed_and_method_ray.functions.raster import decode_bmp, decode_ppm

        with _pytest.raises(ValueError):
            decode_bmp(b"nope")
        with _pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")

    def test_png_roundtrip(self):
        import numpy as np

        from pubmed_and_method_ray.functions.raster import decode_png, encode_png

        for w, h in ((1, 1), (8, 5), (13, 7)):
            px = _gradient_rgb(w, h)
            assert np.array_equal(decode_png(encode_png(px)), px)

    def test_png_all_filter_types(self):
        """Decode a hand-filtered PNG exercising every scanline filter
        (None/Sub/Up/Average/Paeth), matching the spec's reference
        reconstruction."""
        import struct
        import zlib

        import numpy as np

        from pubmed_and_method_ray.functions.raster import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )

        rng = np.random.default_rng(7)
        w, h, bpp = 6, 5, 3
        px = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
        raw = px.reshape(h, w * bpp).astype(np.int16)

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
            if pa_ <= pb_ and pa_ <= pc_:
                return a
            return b if pb_ <= pc_ else c

        lines = bytearray()
        for y, ft in enumerate([0, 1, 2, 3, 4]):
            lines.append(ft)
            prev = raw[y - 1] if y else np.zeros(w * bpp, dtype=np.int16)
            for x in range(w * bpp):
                a = int(raw[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ft == 0:
                    f = raw[y, x]
                elif ft == 1:
                    f = raw[y, x] - a
                elif ft == 2:
                    f = raw[y, x] - b
                elif ft == 3:
                    f = raw[y, x] - (a + b) // 2
                else:
                    f = raw[y, x] - paeth(a, b, c)
                lines.append(int(f) % 256)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(payload), px)

    def test_png_rgba_drops_alpha(self):
        import struct
        import zlib

        import numpy as np

        from pubmed_and_method_ray.functions.raster import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )

        rng = np.random.default_rng(3)
        w, h = 4, 3
        px = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        raw = np.zeros((h, 1 + w * 4), dtype=np.uint8)
        raw[:, 1:] = px.reshape(h, w * 4)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(payload), px[:, :, :3])

    def test_jpeg_roundtrip_within_loss(self):
        """Baseline JPEG encode->decode: exact dims, solid colors near-
        exact (DC-only blocks), smooth gradients within normal JPEG loss
        — including non-multiple-of-8 dimensions (edge-replicated pad)."""
        import numpy as np

        from pubmed_and_method_ray.functions.raster import (
            decode_jpeg,
            decode_raster,
            encode_jpeg,
        )

        solid = np.full((24, 40, 3), [200, 60, 30], dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(solid))
        assert dec.shape == (24, 40, 3)
        assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 1

        h, w = 33, 50
        yy, xx = np.mgrid[0:h, 0:w]
        grad = np.stack(
            [yy * 255 // h, xx * 255 // w, (yy + xx) * 255 // (h + w)], axis=2
        ).astype(np.uint8)
        payload = encode_jpeg(grad)
        dec = decode_raster(payload)  # magic-byte sniffing path
        assert dec.shape == (h, w, 3)
        err = np.abs(dec.astype(int) - grad.astype(int))
        assert err.mean() < 4 and err.max() < 32

    def test_jpeg_rejects_non_baseline(self):
        import numpy as np

        from pubmed_and_method_ray.functions.raster import (
            decode_jpeg,
            encode_jpeg,
        )

        px = np.zeros((8, 8, 3), dtype=np.uint8)
        payload = bytearray(encode_jpeg(px))
        # flip SOF0 (0xC0) to SOF2 (progressive): must raise, not corrupt
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC2
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01not a jpeg")

    def test_jpeg_corrupt_streams_raise_valueerror(self):
        """Malformed entropy streams must fail with the decoder's
        declared ValueError, never an IndexError out of the actor:
        (a) DRI declared but the stream carries no RST markers;
        (b) a crafted AC run pushing the coefficient index past 63."""
        import struct

        import numpy as np

        from pubmed_and_method_ray.functions import raster as R

        base = R.encode_jpeg(np.zeros((8, 16, 3), dtype=np.uint8))
        i = base.find(b"\xff\xda")
        dri = struct.pack(">BBH", 0xFF, 0xDD, 4) + struct.pack(">H", 1)
        with pytest.raises(ValueError, match="RST"):
            R.decode_jpeg(base[:i] + dri + base[i:])

        # valid headers from a 1-MCU image, scan replaced with: DC(0),
        # ZRL x3 (k=49), then (run=15, size=1) -> k = 64 out of range
        base1 = R.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
        j = base1.find(b"\xff\xda")
        (sos_len,) = struct.unpack_from(">H", base1, j + 2)
        head = base1[: j + 2 + sos_len]
        bw = R._BitWriter()
        dc = R._huff_encode_map(R._DC_L_BITS, R._DC_L_VALS)
        ac = R._huff_encode_map(R._AC_L_BITS, R._AC_L_VALS)
        code, ln = dc[0]
        bw.write(code, ln)
        for _ in range(3):
            code, ln = ac[0xF0]
            bw.write(code, ln)
        code, ln = ac[0xF1]
        bw.write(code, ln)
        bw.write(1, 1)
        with pytest.raises(ValueError, match="> 63"):
            R.decode_jpeg(head + bw.flush() + b"\xff\xd9")

    def test_png_unsupported_shapes_rejected(self):
        import struct
        import zlib

        import pytest as _pytest

        from pubmed_and_method_ray.functions.raster import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )

        with _pytest.raises(ValueError):
            decode_png(b"not a png")
        # 16-bit depth: declared unsupported
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _png_chunk(b"IEND", b"")
        )
        with _pytest.raises(NotImplementedError):
            decode_png(payload)


class TestDecodeActors:
    def test_real_mode_decodes_bmp_and_ppm(self):
        """mode='real' genuinely decodes rasters: dims match the encoded
        image, features are the pixel statistics."""
        import numpy as np

        for fmt in ("bmp", "ppm", "png"):
            b = _raster_batch(fmt)
            o = DecodePayload(mode="real")(b)
            assert o["width"].to_pylist() == [8, 9, 10, 11]
            assert o["height"].to_pylist() == [5, 6, 7, 8]
            px0 = _gradient_rgb(8, 5)
            assert abs(
                o["f0"][0].as_py() - px0[:, :, 0].mean() / 255.0
            ) < 1e-12

    def test_real_resize_checksums_pixels(self):
        from pubmed_and_method_ray.functions.raster import resize_nearest
        import hashlib

        b = _raster_batch("bmp", n=2)
        o = ResizePayload(width=4, height=4, mode="real")(b)
        assert o["width"].to_pylist() == [4, 4]
        want = hashlib.md5(
            resize_nearest(_gradient_rgb(8, 5), 4, 4).tobytes()
        ).hexdigest()[:16]
        assert o["resized_checksum"][0].as_py() == want

    def test_real_mode_decodes_baseline_jpeg(self):
        """mode='real' decodes actual baseline JFIF streams: dims exact,
        features within JPEG loss of the source pixel statistics."""
        import numpy as np

        from pubmed_and_method_ray.functions.raster import encode_jpeg

        payloads = [encode_jpeg(_gradient_rgb(8 + i, 5 + i)) for i in range(4)]
        b = pa.Table.from_pydict(
            {
                "doc_id": list(range(4)),
                "payload": payloads,
                "media_type": ["image/jpeg"] * 4,
                "payload_bytes": [len(p) for p in payloads],
            }
        )
        o = DecodePayload(mode="real")(b)
        assert o["width"].to_pylist() == [8, 9, 10, 11]
        assert o["height"].to_pylist() == [5, 6, 7, 8]
        px0 = _gradient_rgb(8, 5)
        assert abs(o["f0"][0].as_py() - px0[:, :, 0].mean() / 255.0) < 0.02

    def test_real_mode_stub_boundary(self):
        """Unsupported payload formats in real mode raise loudly."""
        with pytest.raises(NotImplementedError):
            DecodePayload(mode="real")(_payload_batch())
        with pytest.raises(NotImplementedError):
            ResizePayload(mode="real")(_payload_batch())
        with pytest.raises(ValueError):  # text bytes are not RIFF AVI
            SampleFrames(mode="real")(_payload_batch())
        with pytest.raises(ValueError):
            DecodePayload(mode="bogus")

    def test_real_mode_samples_mjpeg_avi_frames(self):
        """mode='real' parses actual RIFF AVI containers and hashes the
        DECODED pixels of evenly spaced MJPEG frames; byte_offset is the
        real '00dc' chunk offset into the payload."""
        import hashlib

        import numpy as np

        from pubmed_and_method_ray.functions.raster import (
            decode_jpeg,
            encode_mjpeg_avi,
            mjpeg_avi_frames,
        )

        frames = [_gradient_rgb(16, 12) for _ in range(6)]
        for i, f in enumerate(frames):  # make frames distinct
            frames[i] = np.roll(f, i * 3, axis=1)
        avi = encode_mjpeg_avi(frames, fps=5)
        parsed = mjpeg_avi_frames(avi)
        assert len(parsed) == 6
        b = pa.Table.from_pydict(
            {
                "doc_id": [7],
                "payload": [avi],
                "media_type": ["video/x-msvideo"],
                "payload_bytes": [len(avi)],
            }
        )
        o = SampleFrames(n_frames=4, mode="real")(b)
        assert o.num_rows == 4
        assert o["frame_idx"].to_pylist() == [0, 1, 2, 3]
        # evenly spaced: frame (i*6)//4 -> 0, 1, 3, 4
        want_offsets = [parsed[(i * 6) // 4][0] for i in range(4)]
        assert o["byte_offset"].to_pylist() == want_offsets
        px0 = decode_jpeg(parsed[0][1])
        assert o["frame_checksum"][0].as_py() == hashlib.md5(
            px0.tobytes()
        ).hexdigest()[:8]
        # decoded pixels match the source frames within JPEG loss
        err = np.abs(px0.astype(float) - frames[0].astype(float)).mean()
        assert err < 12

    def test_fake_decode_deterministic(self):
        b = _payload_batch()
        o1 = DecodePayload()(b)
        o2 = DecodePayload()(b)
        assert o1.equals(o2)
        assert o1.column_names == ["doc_id", "width", "height"] + [
            f"f{j}" for j in range(8)
        ] + ["payload_bytes", "payload_md5"]
        assert all(64 <= w < 256 for w in o1["width"].to_pylist())

    def test_resize_outputs_target_dims(self):
        o = ResizePayload(width=128, height=96)(_payload_batch())
        assert set(o["width"].to_pylist()) == {128}
        assert set(o["height"].to_pylist()) == {96}
        # checksum depends on content
        assert len(set(o["resized_checksum"].to_pylist())) == o.num_rows

    def test_frame_sampling_expands_rows(self):
        o = SampleFrames(n_frames=3)(_payload_batch(4))
        assert o.num_rows == 12
        assert sorted(set(o["frame_idx"].to_pylist())) == [0, 1, 2]


class TestPipelines:
    def test_decode_features_ds(self):
        df = decode_features(SF).to_pandas()
        assert len(df) == 500
        assert set(df.columns) == {
            "doc_id",
            "width",
            "height",
            "payload_bytes",
            "payload_md5",
        } | {f"f{j}" for j in range(8)}

    def test_resize_and_frames_ds(self):
        r = resize_features(SF).to_pandas()
        assert len(r) == 500
        f = frame_samples(SF).to_pandas()
        assert len(f) == 2000  # 4 frames per doc
