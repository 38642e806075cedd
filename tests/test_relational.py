"""Boundary pins for the TPC-H-shape subquery suite
(queries/relational.py): every threshold below sits EXACTLY on its
boundary, proving the exact-integer predicates (no float comparison
that could drift by an ulp and flip membership).
"""

from __future__ import annotations

import datetime as dt

from nycitibike_data_transform_spark.queries import all_queries


def _write(spark, tmp_path, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).write.parquet(f"{tmp_path}/{name}.parquet")


def test_customer_distribution_keeps_zero_order_customers(spark, tmp_path):
    # customer 3 has an order OUTSIDE the 1995 window -> must appear in
    # the c_count=0 bucket, not vanish (the date predicate lives in the
    # JOIN condition, not a WHERE)
    _write(
        spark,
        tmp_path,
        "customer",
        [(1,), (2,), (3,)],
        "c_custkey long",
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [
            (10, 1, dt.datetime(1995, 6, 1)),
            (11, 1, dt.datetime(1995, 7, 1)),
            (12, 2, dt.datetime(1995, 6, 1)),
            (13, 3, dt.datetime(1997, 6, 1)),  # outside window
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = {
        r["c_count"]: r["custdist"]
        for r in all_queries()["customer_distribution"].spark(spark, str(tmp_path)).collect()
    }
    assert out == {2: 1, 1: 1, 0: 1}


def test_small_qty_revenue_boundary_is_strict(spark, tmp_path):
    # one Brand#17 part, quantities [1,1,1,2,45]: n=5, sum=50.
    # predicate 5*qty*n < sum: qty=1 -> 25<50 INCLUDED (3 rows);
    # qty=2 -> 50<50 EXCLUDED (exact boundary); qty=45 excluded.
    _write(
        spark,
        tmp_path,
        "part",
        [(1, "Brand#17"), (2, "Brand#9")],
        "p_partkey long, p_brand string",
    )
    li = [(1, float(q), 100.0) for q in (1, 1, 1, 2, 45)]
    li += [(2, 1.0, 999.0)]  # other brand: ignored
    _write(
        spark,
        tmp_path,
        "lineitem",
        li,
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    row = all_queries()["small_qty_revenue"].spark(spark, str(tmp_path)).collect()[0]
    assert row["n_rows"] == 3
    assert row["avg_yearly"] == round(300.0 / 7.0, 6)


def test_top_supplier_returns_all_tied_winners(spark, tmp_path):
    ship = dt.datetime(1996, 2, 1)
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 100.0, 0.0, ship),
            (2, 50.0, 0.0, ship),
            (2, 50.0, 0.0, ship),
            (3, 99.0, 0.0, ship),
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "s1"), (2, "s2"), (3, "s3")],
        "s_suppkey long, s_name string",
    )
    rows = all_queries()["top_supplier"].spark(spark, str(tmp_path)).collect()
    assert [(r["s_suppkey"], r["total_revenue"]) for r in rows] == [
        (1, 100.0),
        (2, 100.0),
    ]


def test_idle_rich_threshold_is_strict_above_average(spark, tmp_path):
    # positive balances 10, 20, 30 -> avg 20. customer at EXACTLY 20
    # must be excluded (strict >); 30 qualifies unless they placed an
    # URGENT order.
    _write(
        spark,
        tmp_path,
        "customer",
        [(1, 10.0, 0), (2, 20.0, 0), (3, 30.0, 0), (4, 30.0, 0), (5, -5.0, 0)],
        "c_custkey long, c_acctbal double, c_nationkey int",
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [(10, 4, "1-URGENT"), (11, 3, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    _write(
        spark,
        tmp_path,
        "nation",
        [(0, "ZANZIBAR")],
        "n_nationkey int, n_name string",
    )
    rows = all_queries()["idle_rich_customers"].spark(spark, str(tmp_path)).collect()
    # only customer 3: above-average AND no urgent order
    assert len(rows) == 1
    assert rows[0]["numcust"] == 1 and rows[0]["totacctbal"] == 30.0


def test_important_parts_boundary_excluded(spark, tmp_path):
    # two parts with values 130 and 70 (discount 0): mean 100, the 1.3x
    # threshold = 130 -> part 1 sits EXACTLY on it and must be excluded
    # (strict >); bump one cent over and it qualifies.
    _write(
        spark,
        tmp_path,
        "lineitem",
        [(1, 130.0, 0.0), (2, 70.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    assert all_queries()["important_parts"].spark(spark, str(tmp_path)).count() == 0


def test_large_volume_boundary_excluded(spark, tmp_path):
    # order 10 totals EXACTLY 200 -> excluded (strict >); order 11 at
    # 201 qualifies
    _write(
        spark,
        tmp_path,
        "lineitem",
        [(10, 200.0), (11, 100.0), (11, 101.0)],
        "l_orderkey long, l_quantity double",
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [(10, 1, dt.datetime(1996, 1, 1), 1000.0), (11, 1, dt.datetime(1996, 1, 2), 900.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    _write(spark, tmp_path, "customer", [(1, "c1")], "c_custkey long, c_name string")
    rows = all_queries()["large_volume_customers"].spark(spark, str(tmp_path)).collect()
    assert [(r["o_orderkey"], r["total_qty"]) for r in rows] == [(11, 201)]
