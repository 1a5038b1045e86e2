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


class TestDecodeActors:
    def test_real_mode_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            DecodePayload(mode="real")(_payload_batch())
        with pytest.raises(NotImplementedError):
            ResizePayload(mode="real")(_payload_batch())
        with pytest.raises(NotImplementedError):
            SampleFrames(mode="real")(_payload_batch())
        with pytest.raises(ValueError):
            DecodePayload(mode="bogus")

    def test_fake_decode_deterministic(self):
        b = _payload_batch()
        o1 = DecodePayload()(b)
        o2 = DecodePayload()(b)
        assert o1.equals(o2)
        assert o1.column_names == ["doc_id", "width", "height"] + [
            f"f{j}" for j in range(8)
        ]
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
        assert set(df.columns) == {"doc_id", "width", "height"} | {
            f"f{j}" for j in range(8)
        }

    def test_resize_and_frames_ds(self):
        r = resize_features(SF).to_pandas()
        assert len(r) == 500
        f = frame_samples(SF).to_pandas()
        assert len(f) == 2000  # 4 frames per doc
