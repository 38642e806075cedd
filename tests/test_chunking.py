"""Chunking operator semantics."""

from __future__ import annotations

import pytest

from nycitibike_data_transform_spark.operators.chunking import chunk_documents


def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def test_exact_cover_no_overlap(spark):
    df = _doc(spark, "a b c d e f")
    out = sorted(chunk_documents(df, 2, 0).collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in out] == ["a b", "c d", "e f"]
    assert all(r["n_chunk_tokens"] == 2 for r in out)


def test_overlap_windows(spark):
    df = _doc(spark, "a b c d e")
    out = sorted(chunk_documents(df, 3, 1).collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in out] == ["a b c", "c d e"]


def test_short_doc_single_chunk(spark):
    out = chunk_documents(_doc(spark, "only two"), 16, 4).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "only two"
    assert out[0]["n_chunk_tokens"] == 2


def test_ragged_tail(spark):
    df = _doc(spark, "a b c d e f g")
    out = sorted(chunk_documents(df, 3, 0).collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in out] == ["a b c", "d e f", "g"]
    assert out[-1]["n_chunk_tokens"] == 1


def test_every_token_covered(spark):
    text = " ".join(f"t{i}" for i in range(50))
    out = chunk_documents(_doc(spark, text), 8, 2).collect()
    seen = set()
    for r in out:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"t{i}" for i in range(50)}


def test_validation():
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, 4, 4)
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(None, 0)
