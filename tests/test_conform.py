"""Conform-union semantics (reference AUX_TLC_RIDES.sql:3-32; the
tricky padding/cast rules SURVEY.md §5.2 pins)."""

from __future__ import annotations

import pytest

from nycitibike_data_transform_spark.operators.conform import ConformSpec, conform, conform_union

SPEC = ConformSpec(
    columns={"id": "bigint", "amount": "double", "vendor_id": "string"},
    defaults={"vendor_id": ""},
)


def test_conform_renames_and_casts(spark):
    df = spark.createDataFrame([(1, 2.5, 42)], "k int, amt double, vid int")
    out = conform(df, {"id": "k", "amount": "amt", "vendor_id": "vid"}, SPEC)
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint",
        "amount:double",
        "vendor_id:string",
    ]
    row = out.first()
    assert (row["id"], row["amount"], row["vendor_id"]) == (1, 2.5, "42")


def test_conform_pads_null_and_empty_string(spark):
    df = spark.createDataFrame([(7,)], "k int")
    row = conform(df, {"id": "k"}, SPEC).first()
    assert row["amount"] is None  # NULL pad (AUX_TLC_RIDES.sql:22-24)
    assert row["vendor_id"] == ""  # '' pad   (AUX_TLC_RIDES.sql:16-17)


def test_conform_rejects_unknown_columns(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown canonical"):
        conform(df, {"nope": "k"}, SPEC)


def test_conform_union_bag_semantics_and_source(spark):
    a = spark.createDataFrame([(1, 1.0), (1, 1.0)], "k int, amt double")
    b = spark.createDataFrame([(1,)], "k int")
    out = conform_union(
        {"a": (a, {"id": "k", "amount": "amt"}), "b": (b, {"id": "k"})},
        SPEC,
        source_column="src",
    )
    rows = out.collect()
    assert len(rows) == 3  # UNION ALL keeps duplicates
    assert sorted(r["src"] for r in rows) == ["a", "a", "b"]


def test_spec_validation():
    with pytest.raises(ValueError):
        ConformSpec(columns={})
    with pytest.raises(ValueError):
        ConformSpec(columns={"a": "int"}, defaults={"b": 1})
