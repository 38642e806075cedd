"""Multimodal column plumbing (north-star, SURVEY.md §2.9).

Images/audio/video ride through the engine as opaque ``binary``
payloads plus a typed metadata struct — the same posture the reference
takes toward its WKB ``geometry: binary`` column (reference
``ref/2_DIM___AUX_NYC|nyc_nta_zones.parquet``, SURVEY.md §2.1 S6):
store, move, and partition the bytes; decode only at the edge.

Decode status: PNG decode is REAL — ``operators/imaging.py`` is a
pure-numpy codec (zlib + scanline filters; no media libs exist in
this container), driven end-to-end by the ``image_pipeline`` driver
query and ``imaging.decode_image_batch``. Other codecs (JPEG, audio,
video) remain gated: ``extract_features`` raises NotImplementedError
unless handed a decoder (tests use the deterministic
``fake_decoder``); the Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition behavior — is identical
for every codec and fully tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum_md5", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a column's bytes as an opaque media payload + metadata
    struct (the testdata carries no real media; text bytes stand in —
    the engine-side plumbing is identical for jpeg/wav bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum_md5"),
        ),
    )


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: 4 cheap byte
    statistics. Real deployments swap in PIL/libsndfile here."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    total = sum(payload)
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(total % 997),
    ]


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the decode runs per partition, batch-at-a-time,
    so executor memory holds one Arrow batch of payloads, never the
    whole partition's media.

    Without a decoder this raises NotImplementedError at plan-build
    time (image/audio libs are not in this container — clearly-marked
    stub per the build contract).
    """
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment; pass decoder= "
            "(tests use multimodal.fake_decoder)"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf[payload_col].map(
                        lambda b: decoder(bytes(b)) if b is not None else None
                    ),
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)
