"""Frame container + frame sampling: span table round-trips, seek
without decode, stride semantics, poison containment at both the
container and the individual-frame level."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nycitibike_data_transform_spark.operators.imaging import encode_png
from nycitibike_data_transform_spark.operators.video import (
    FramesError,
    encode_frames,
    iter_frame_spans,
    sample_frames_batch,
)


def _solid(r, g, b, h=2, w=3):
    return encode_png(np.full((h, w, 3), (r, g, b), dtype=np.uint8))


def test_span_table_round_trip():
    frames = [_solid(1, 2, 3), _solid(4, 5, 6), b"short"]
    data = encode_frames(frames)
    spans = iter_frame_spans(data)
    assert [data[o : o + n] for o, n in spans] == frames


def test_container_errors():
    with pytest.raises(FramesError, match="magic"):
        iter_frame_spans(b"MP4?xxxx")
    data = bytearray(encode_frames([_solid(0, 0, 0)]))
    data[4:8] = struct.pack("<I", 5)  # claim 5 frames, ship 1
    with pytest.raises(FramesError, match="truncated|past end"):
        iter_frame_spans(bytes(data))


def test_sampling_stride_and_poison(spark):
    frames = [_solid(10 * f, 20, 30) for f in range(5)]
    bad_frame = [_solid(1, 1, 1), b"not a png", _solid(3, 3, 3)]
    rows = [
        (1, bytearray(encode_frames(frames))),
        (2, bytearray(encode_frames(bad_frame))),
        (3, bytearray(b"garbage container")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames_batch(df, stride=2).collect()
    d1 = sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["frame_idx"]
    )
    # stride 2 over 5 frames -> indices 0, 2, 4
    assert [r["frame_idx"] for r in d1] == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in d1)
    assert [r["mean_r"] for r in d1] == [0.0, 20.0, 40.0]
    assert {(r["width"], r["height"]) for r in d1} == {(3, 2)}
    d2 = {r["frame_idx"]: r for r in out if r["doc_id"] == 2}
    # frame 1 is poison but NOT sampled at stride 2 -> both rows clean
    assert set(d2) == {0, 2} and all(r["decode_error"] is None for r in d2.values())
    d3 = [r for r in out if r["doc_id"] == 3]
    assert len(d3) == 1 and "FramesError" in d3[0]["decode_error"]
    assert d3[0]["frame_idx"] is None


def test_sampled_poison_frame_poisons_only_its_row(spark):
    bad_frame = [b"not a png", _solid(2, 2, 2)]
    df = spark.createDataFrame(
        [(7, bytearray(encode_frames(bad_frame)))], "doc_id long, payload binary"
    )
    out = {r["frame_idx"]: r for r in sample_frames_batch(df, stride=1).collect()}
    assert "PngError" in out[0]["decode_error"] and out[0]["mean_r"] is None
    assert out[1]["decode_error"] is None and out[1]["mean_r"] == 2.0


def test_stride_validation():
    with pytest.raises(FramesError, match="stride"):
        sample_frames_batch(None, stride=0)
