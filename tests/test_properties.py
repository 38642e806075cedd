"""Property-based tests (hypothesis) for the pure plan-construction
layer — cheap per-example (no Spark actions), so examples can be many —
plus a couple of low-example end-to-end invariants."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from nycitibike_data_transform_spark.catalog import ENVS, LAYERS, table_name
from nycitibike_data_transform_spark.operators.similarity import _projection_vectors

# --------------------------------------------------- pure constructors


@given(st.sampled_from(ENVS), st.sampled_from(LAYERS), st.text(min_size=1, max_size=20))
def test_table_name_total_on_valid_inputs(env, layer, table):
    name = table_name(env, layer, table)
    assert name == name.lower()
    assert name.startswith(f"{env}_{layer}__")


@given(
    st.integers(min_value=1, max_value=128),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**31),
)
def test_projection_vectors_shape_and_determinism(dim, bits, seed):
    p1 = _projection_vectors(dim, bits, seed)
    p2 = _projection_vectors(dim, bits, seed)
    assert p1 == p2  # same seed → identical hyperplanes
    assert len(p1) == bits and all(len(row) == dim for row in p1)
    assert all(-1.0 <= v <= 1.0 and math.isfinite(v) for row in p1 for v in row)


@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=0, max_value=2**31))
def test_projection_vectors_seed_sensitivity(s1, s2):
    if s1 == s2:
        return
    assert _projection_vectors(8, 2, s1) != _projection_vectors(8, 2, s2)


# ------------------------------------------- end-to-end invariants (few examples)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.floats(0, 1e6, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_conform_union_preserves_bag_cardinality(spark, rows):
    from nycitibike_data_transform_spark.operators.conform import ConformSpec, conform_union

    spec = ConformSpec(columns={"id": "bigint", "x": "double", "pad": "string"})
    df = spark.createDataFrame(rows, "id bigint, x double")
    out = conform_union(
        {"a": (df, {"id": "id", "x": "x"}), "b": (df, {"id": "id"})}, spec
    )
    collected = out.collect()
    assert len(collected) == 2 * len(rows)  # UNION ALL: no dedup ever
    assert all(r["pad"] is None for r in collected)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(-90, 90, allow_nan=False).map(lambda v: round(v, 4)), min_size=1, max_size=8
    ),
    st.floats(-90, 90, allow_nan=False).map(lambda v: round(v, 4)),
    st.floats(-180, 180, allow_nan=False).map(lambda v: round(v, 4)),
)
def test_haversine_nonnegative_and_bounded(spark, lats, lat2, lng2):
    from pyspark.sql import functions as F

    from nycitibike_data_transform_spark.functions.geo import haversine

    df = spark.createDataFrame([(la, 10.0) for la in lats], "lat double, lng double")
    vals = [
        r["d"]
        for r in df.select(
            haversine("lat", "lng", F.lit(lat2), F.lit(lng2), "km").alias("d")
        ).collect()
    ]
    half_circumference = math.pi * 6371.0
    for v in vals:
        assert 0.0 <= v <= half_circumference + 1e-6
        assert not math.isnan(v)  # the [-1,1] clamp guarantee


# ------------------------------------------- connected components (r4)


def _uf_components(edges, vertices):
    """Pure-python union-find reference for connected_components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    for v in vertices:
        find(v)
    groups = {}
    for v in parent:
        groups.setdefault(find(v), set()).add(v)
    return {v: min(g) for g in groups.values() for v in g}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    ),
    st.sets(st.integers(0, 25), max_size=10),
)
def test_connected_components_matches_union_find(spark, edges, extra_vertices):
    from nycitibike_data_transform_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    endpoint_vertices = {v for e in edges for v in e}
    expected = _uf_components(edges, endpoint_vertices | extra_vertices)
    edf = spark.createDataFrame(edges or [(0, 1)][:0], "src long, dst long")
    vdf = spark.createDataFrame(
        [(v,) for v in endpoint_vertices | extra_vertices] or [(0,)][:0], "id long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, vertices=vdf).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=20, deadline=None)
def test_padded_batches_matches_python_reference(spark, docs):
    """Differential: the length-bucket rank decomposition in
    padded_batches must equal naive Python batching of
    (n_tokens DESC, doc_id ASC) order for arbitrary length
    distributions (duplicates, gaps, empty docs)."""
    import tempfile

    from nycitibike_data_transform_spark.queries import all_queries

    rows = [(i, "tok " * n if n else "", "en", "web", 4 * n) for i, n in docs]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows or [(0, None, None, None, 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).limit(len(rows)).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["batch_id"]: (r["n_docs"], r["max_tokens"], r["min_tokens"], r["sum_tokens"], r["padding_waste"])
            for r in all_queries()["padded_batches"].spark(spark, d).collect()
        }
    # pure-Python reference
    order = sorted(docs, key=lambda t: (-t[1], t[0]))
    want = {}
    for b in range(0, len(order), 32):
        chunk = [n for _, n in order[b : b + 32]]
        want[b // 32] = (
            len(chunk),
            max(chunk),
            min(chunk),
            sum(chunk),
            len(chunk) * max(chunk) - sum(chunk),
        )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False).map(lambda v: round(v, 3)),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=14, unique_by=tuple,
    ),
    st.floats(0.1, 0.95).map(lambda v: round(v, 2)),
    st.integers(min_value=1, max_value=6),
)
def test_probe_audit_is_exact_restriction_of_grid(spark, vecs, threshold, n_probe):
    """For ANY corpus, threshold, and probe prefix: the probe audit
    equals the exhaustive grid tier restricted to probe-touching
    pairs — the operator's exactness contract, property-tested."""
    from nycitibike_data_transform_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_probe,
    )

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    probe = emb.filter(f"vec_id < {n_probe}")
    probed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_probe(emb, probe, threshold).collect()
    }
    grid = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold, method="grid").collect()
        if r["id_a"] < n_probe or r["id_b"] < n_probe
    }
    assert probed == grid


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                # dedup key
            st.integers(0, 100),              # ordering value
            st.text(min_size=0, max_size=6),  # payload
        ),
        min_size=1, max_size=25,
    )
)
def test_deduplicate_one_winner_per_key_and_is_a_source_row(spark, rows):
    from pyspark.sql import functions as F

    from nycitibike_data_transform_spark.functions.dbt_compat import deduplicate

    df = spark.createDataFrame(rows, "k int, v int, payload string")
    out = deduplicate(df, ["k"], [F.col("v").desc(), F.col("payload").asc()]).collect()
    keys = [r["k"] for r in out]
    assert sorted(set(keys)) == sorted({r[0] for r in rows})  # every key, once
    assert len(keys) == len(set(keys))
    src = {tuple(r) for r in rows}
    assert all((r["k"], r["v"], r["payload"]) in src for r in out)
    # the winner really is max-v (min-payload tie-break) per key
    for r in out:
        vmax = max(v for k, v, _ in rows if k == r["k"])
        assert r["v"] == vmax


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 8),  # key
                st.integers(0, 5),  # watermark day
                st.integers(0, 99),  # payload
            ),
            min_size=1,
            max_size=12,
            unique_by=lambda r: r[0],  # unique_key per build (dbt contract)
        ),
        min_size=2,
        max_size=3,
    )
)
def test_incremental_model_matches_python_reference(spark, feeds):
    """Incremental materialization == the spec executed in plain
    Python: bootstrap keeps the full feed; each later run keeps built
    rows with watermark >= max(existing watermark) and merges them on
    the key (delete-insert). Any sequence of feeds, any watermark
    order — including late rows below the max, which both sides must
    MISS identically (the documented trade, pinned here so it can
    never silently change)."""
    import shutil
    import tempfile

    from nycitibike_data_transform_spark.pipeline import Pipeline

    tmp = tempfile.mkdtemp(prefix="inc_prop_")
    try:
        table: dict[int, tuple[int, int, int]] = {}
        first = True
        for feed in feeds:
            p = Pipeline(warehouse_dir=tmp)
            p.add_source(
                "src",
                lambda s, f=feed: s.createDataFrame(
                    f, "k int, day int, v int"
                ),
            )
            p.add_model(
                "inc",
                lambda s, src: src,
                deps=("src",),
                incremental_keys=("k",),
                watermark_col="day",
            )
            got = p.run(spark)["inc"]
            if first:
                updates = feed
                first = False
            else:
                hwm = max(r[1] for r in table.values())
                updates = [r for r in feed if r[1] >= hwm]
            for r in updates:
                table[r[0]] = r
            assert sorted(map(tuple, got.collect())) == sorted(table.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


class TestDecimalZoneMapBounds:
    """Property pins for the r10 exact decimal zone-map encoding: the
    pruning decision computed on the scaled-int grid must NEVER drop a
    file whose true [min, max] interval intersects the true query
    interval — for any decimal(18,2) stats (including far above 2^53)
    and any bound representation (Decimal, int, or float)."""

    from decimal import Decimal as _D

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _cents = st.integers(min_value=-(10**18) + 1, max_value=10**18 - 1)

    @staticmethod
    def _dec(cents: int):
        from decimal import Decimal

        return Decimal(cents).scaleb(-2)

    @given(a=_cents, b=_cents, lo=_cents, hi=_cents)
    @settings(max_examples=500, deadline=None)
    def test_prune_is_conservative_and_tight(self, a, b, lo, hi):
        from nycitibike_data_transform_spark.versioning import _decimal_bound

        fmin, fmax = min(a, b), max(a, b)  # file stats, scaled cents
        qlo, qhi = min(lo, hi), max(lo, hi)
        lo_j = _decimal_bound(self._dec(qlo), 2, "lo")
        hi_j = _decimal_bound(self._dec(qhi), 2, "hi")
        pruned = fmax < lo_j or fmin > hi_j
        overlaps = not (fmax < qlo or fmin > qhi)  # exact integer math
        # conservative: never prune an overlapping file; and for
        # on-grid Decimal bounds the decision is TIGHT (prunes iff
        # disjoint — no fail-safe slop)
        assert pruned == (not overlaps)

    @given(cents=_cents, scale_off=st.integers(min_value=0, max_value=4))
    @settings(max_examples=300, deadline=None)
    def test_off_grid_bounds_round_conservatively(self, cents, scale_off):
        from decimal import Decimal

        from nycitibike_data_transform_spark.versioning import _decimal_bound

        # a bound with MORE precision than the column grid (scale 2):
        # lo floors, hi ceils — the kept interval only ever widens
        extra = Decimal(cents).scaleb(-2 - scale_off)
        lo_j = _decimal_bound(extra, 2, "lo")
        hi_j = _decimal_bound(extra, 2, "hi")
        true_scaled = extra.scaleb(2)
        assert Decimal(lo_j) <= true_scaled <= Decimal(hi_j)
        assert Decimal(hi_j) - Decimal(lo_j) <= 1

    @given(cents=_cents)
    @settings(max_examples=200, deadline=None)
    def test_float_bounds_match_user_intent(self, cents):
        """float bounds go through str(): the user means the printed
        decimal, and for 2-decimal floats the grid round-trip is exact
        whenever the float prints back to the same 2-decimal literal
        (always true for abs(value) < 2^49 cents)."""
        from decimal import Decimal

        from nycitibike_data_transform_spark.versioning import _decimal_bound

        if abs(cents) >= (1 << 49):
            return
        f = float(Decimal(cents).scaleb(-2))
        if str(f) != format(Decimal(cents).scaleb(-2), "f").rstrip("0").rstrip("."):
            return  # float repr moved off the 2-decimal literal: out of scope
        assert _decimal_bound(f, 2, "lo") <= cents <= _decimal_bound(f, 2, "hi")
