"""Engine-vs-oracle parity on ADVERSARIAL inputs the driver corpus
never exercises (review finding: collection_functions crashed under
ANSI and the quantize oracles dropped malformed vectors — all three
slipped past the sf-corpus gate because the trigger rows don't occur
there). These tests run the registry query AND its DuckDB oracle on
hand-built corner-case tables and require identical row sets.
"""

from __future__ import annotations

import duckdb

from nycitibike_data_transform_spark.queries import all_queries


def _both(spark, tmp_path, table: str, df, query: str):
    df.coalesce(1).write.parquet(f"{tmp_path}/{table}.parquet")
    spec = all_queries()[query]
    engine = {tuple(r) for r in spec.spark(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{tmp_path}/{table}.parquet/*.parquet'"
    )
    oracle = set(map(tuple, con.execute(spec.oracle).fetchall()))
    return engine, oracle


def test_collection_functions_parity_on_degenerate_text(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, None, "en", "w", 0),
            (2, "", "en", "w", 0),
            (3, "   ", "en", "w", 3),
            (4, "zebra apple", "en", "w", 11),
            (5, "one", "en", "w", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    engine, oracle = _both(spark, tmp_path, "documents", docs, "collection_functions")
    assert engine == oracle and len(engine) == 5


def test_embedding_quantize_parity_on_malformed_vectors(spark, tmp_path):
    emb = spark.createDataFrame(
        [(1, [], 0), (2, [0.5, None], 0), (3, [0.5, -0.25], 0), (4, None, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    engine, oracle = _both(spark, tmp_path, "embeddings", emb, "embedding_quantize")
    # only the well-formed vector survives, on BOTH engines
    assert engine == oracle and len(engine) == 1


def test_embedding_quantize_parity_on_nonfinite_vectors(spark, tmp_path):
    """NaN/Inf elements (ADVICE r5): under default-ANSI Spark 4,
    round(NaN)→int raises, so an unfiltered NaN vector CRASHES the
    engine side while the oracle keeps returning rows. valid_embedding
    must drop non-finite vectors on both engines."""
    emb = spark.createDataFrame(
        [
            (1, [float("nan"), 0.5], 0),
            (2, [float("inf"), 0.5], 0),
            (3, [-float("inf")], 0),
            (4, [0.5, -0.25], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    engine, oracle = _both(spark, tmp_path, "embeddings", emb, "embedding_quantize")
    assert engine == oracle and len(engine) == 1


def test_quantized_topk_parity_on_nonfinite_vectors(spark, tmp_path):
    emb = spark.createDataFrame(
        [(1, [float("nan"), 1.0], 0), (2, [1.0, float("inf")], 0)]
        + [(i, [float(i) / 10.0, 1.0 - float(i) / 10.0], 0) for i in range(3, 9)],
        "vec_id long, embedding array<float>, label int",
    )
    engine, oracle = _both(spark, tmp_path, "embeddings", emb, "quantized_topk")
    assert engine == oracle and len(engine) > 0


def test_quantized_topk_parity_on_malformed_vectors(spark, tmp_path):
    emb = spark.createDataFrame(
        [(1, [], 0), (2, [0.5, None], 0)]
        + [(i, [float(i) / 10.0, 1.0 - float(i) / 10.0], 0) for i in range(3, 9)],
        "vec_id long, embedding array<float>, label int",
    )
    engine, oracle = _both(spark, tmp_path, "embeddings", emb, "quantized_topk")
    assert engine == oracle and len(engine) > 0


def test_repetition_strip_parity_on_duplicate_doc_ids(spark, tmp_path):
    """Duplicate doc_ids POOL into one output row on both engines (r13
    review: the oracle's final SELECT joined from raw per-row tokens
    and would have emitted one row per INPUT row — green on the
    unique-id driver corpus, red on any corpus with repeated ids)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "w", 7),
            (1, "a b x y", "en", "w", 7),  # same id, second row
            (2, None, "en", "w", 0),
            (2, "", "en", "w", 0),  # duplicate token-less id
            (3, "p q p q", "en", "w", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    engine, oracle = _both(spark, tmp_path, "documents", docs, "repetition_strip")
    assert engine == oracle and len(engine) == 3
