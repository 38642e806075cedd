"""Connected components / dup-cluster assignment (operators/graph.py).

VERDICT r2 gap #1 + ADVICE r3 high #2: the operator shipped unwired and
crashed with an ambiguous-column AnalysisException on any input (labels
derives from sym, localCheckpoint preserves attribute IDs). These tests
pin the fixed join on chain, clique, singleton, and disconnected-graph
fixtures, plus the end-to-end cluster_assignments contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.graph import (
    cluster_assignments,
    connected_components,
)


def _cc_map(df) -> dict:
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_collapses_to_min_label(spark):
    # 1-2, 2-3, 3-4: diameter-3 chain — needs >1 propagation round
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4)], "src long, dst long"
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disconnected_components_stay_separate(spark):
    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 3, 10: 10, 11: 10}


def test_isolated_vertices_are_singletons(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (7,)], "id long")
    got = _cc_map(connected_components(edges, vertices=verts))
    assert got == {1: 1, 2: 1, 7: 7}


def test_string_ids_and_custom_columns(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c")], "left string, right string"
    )
    got = _cc_map(
        connected_components(edges, src="left", dst="right", id_col="id")
    )
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_max_iter_guard_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_cluster_assignments_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    # {1,2,3} via transitivity, {4,5} direct, 6 pairless singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in cluster_assignments(docs, pairs).collect()
    }
    assert rows == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        4: (4, 2),
        5: (4, 2),
        6: (6, 1),
    }


def test_cluster_assignments_schema(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = cluster_assignments(docs, pairs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "cluster_id",
        "cluster_size",
    ]
    assert dict(out.dtypes)["cluster_size"] == "bigint"


def test_duplicate_vertices_yield_one_singleton(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(7,), (7,), (1,)], "id long")
    rows = connected_components(edges, vertices=verts).collect()
    assert sorted((r["id"], r["component"]) for r in rows) == [(1, 1), (2, 1), (7, 7)]
