"""Frame-sampling over a length-prefixed video container — real bytes,
no media libs.

The third leg of the multimodal surface (after PNG images and WAV
audio): a video, for training-data purposes, is an indexed sequence of
frames. The container here is deliberately minimal — magic + frame
count + per-frame length-prefixed PNG payloads — the structural
essence of an MP4/MKV sample table (stsz/stco): lengths up front so a
reader can SEEK to frame k without decoding frames 0..k-1. That seek
property is what makes frame sampling cheap, and ``iter_frame_spans``
/ ``sample_frames_batch`` exploit it: only the SAMPLED frames are
ever decoded (decode is the dominant cost at scale; sampling every
k-th frame must cost ~1/k of full decode, not all-of-it).

Scale posture: same as imaging/audio — per-record work inside one
``mapInPandas`` stage, embarrassingly parallel, no shuffle; output is
one row per sampled frame (an explode, bounded by n_frames/stride). A
production deployment swaps the PNG step for a hardware decoder
without touching the Spark plumbing. The encoder exists for fixtures
and the closed-form oracle (``queries/llmdata.py:video_frames``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nycitibike_data_transform_spark.operators.imaging import decode_png

_MAGIC = b"FRMS"


class FramesError(ValueError):
    pass


def encode_frames(frames: list[bytes]) -> bytes:
    """Pack already-encoded frame payloads (PNG bytes) into the
    container: magic + u32 count + per frame (u32 length + payload)."""
    out = [_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def iter_frame_spans(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every frame payload WITHOUT decoding any —
    the container's sample-table walk. Raises FramesError on a bad
    magic, truncated header, or lengths pointing past the buffer."""
    if len(data) < 8 or data[:4] != _MAGIC:
        raise FramesError("bad container magic")
    (count,) = struct.unpack_from("<I", data, 4)
    spans: list[tuple[int, int]] = []
    pos = 8
    for _ in range(count):
        if pos + 4 > len(data):
            raise FramesError("truncated frame table")
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + length > len(data):
            raise FramesError("frame length past end of buffer")
        spans.append((pos, length))
        pos += length
    return spans


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def sample_frames_batch(
    df: DataFrame,
    stride: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sample a container column: one output row per frame index
    ``0, stride, 2·stride, …``, each carrying real per-frame decode
    stats. Non-sampled frames are never decoded (seek via the length
    table). A poison container yields ONE row with NULL stats + the
    error; a poison individual frame poisons only its own row."""
    if stride < 1:
        raise FramesError(f"stride must be >= 1, got {stride}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                base = {"doc_id": int(doc_id), "n_frames": None,
                        "frame_idx": None, "width": None, "height": None,
                        "mean_r": None, "mean_g": None, "mean_b": None,
                        "decode_error": None}
                try:
                    data = bytes(payload)
                    spans = iter_frame_spans(data)
                except Exception as e:  # noqa: BLE001
                    base["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                    recs.append(base)
                    continue
                for idx in range(0, len(spans), stride):
                    off, length = spans[idx]
                    rec = dict(base, n_frames=len(spans), frame_idx=idx)
                    try:
                        img = decode_png(data[off : off + length])
                        h, w, c = img.shape
                        means = img.reshape(-1, c).mean(axis=0)
                        rec.update(
                            width=w, height=h,
                            mean_r=float(means[0]),
                            mean_g=float(means[1]) if c >= 3 else float(means[0]),
                            mean_b=float(means[2]) if c >= 3 else float(means[0]),
                        )
                    except Exception as e:  # noqa: BLE001
                        rec["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                    recs.append(rec)
            yield pd.DataFrame(recs)

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_STATS_SCHEMA)
