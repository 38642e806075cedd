"""edit_distance_pairs: the PassJoin segment prefilter must be
LOSSLESS — output identical to the naive all-pairs Levenshtein join on
every input, including the adversarial shapes (short strings with
empty segments, indel-shifted matches, boundary distance d)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.fuzzy import edit_distance_pairs


def _brute(spark, rows, d):
    df = spark.createDataFrame(rows, "id bigint, txt string")
    a = df.select(F.col("id").alias("key_a"), F.col("txt").alias("ta"))
    b = df.select(F.col("id").alias("key_b"), F.col("txt").alias("tb"))
    out = (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b", F.levenshtein("ta", "tb").alias("edit_distance")
        )
        .filter(F.col("edit_distance") <= d)
    )
    return {tuple(r) for r in out.collect()}


def _fast(spark, rows, d):
    df = spark.createDataFrame(rows, "id bigint, txt string")
    return {
        tuple(r) for r in edit_distance_pairs(df, "txt", "id", max_dist=d).collect()
    }


def test_hand_fixtures_distance_boundary(spark):
    rows = [
        (1, "almond antique blue"),
        (2, "almond antique blur"),   # sub, d=1
        (3, "almond antqiue blue"),   # transpose = 2 edits
        (4, "almond antique bluesy"), # 2 inserts
        (5, "almond antique bluesy!"),# 3 edits from 1 -> excluded vs 1
        (6, "chartreuse"),            # unrelated
    ]
    out = _fast(spark, rows, 2)
    assert out == _brute(spark, rows, 2)
    pairs = {(a, b) for a, b, _ in out}
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) in pairs
    assert (1, 5) not in pairs and (1, 6) not in pairs


def test_short_strings_empty_segments(spark):
    # len < d+1 strings: both chars of a 2-char string edited — the
    # EMPTY third segment is the pigeonhole survivor; dropping empty
    # segments would lose (1,2)
    rows = [(1, "ab"), (2, "xy"), (3, "a"), (4, ""), (5, "abc"), (6, "b")]
    assert _fast(spark, rows, 2) == _brute(spark, rows, 2)


def test_indel_shift_within_d(spark):
    # 2 deletions BEFORE the surviving segment: max allowed shift
    rows = [(1, "xxhello world"), (2, "hello world"), (3, "hello worldxx")]
    assert _fast(spark, rows, 2) == _brute(spark, rows, 2)


def test_nulls_never_pair(spark):
    rows = [(1, None), (2, "abc"), (3, None), (4, "abd")]
    out = _fast(spark, rows, 2)
    assert out == {(2, 4, 1)}


def test_randomized_against_brute(spark):
    rng = random.Random(7)
    alpha = "abcde"
    base_words = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(30)]
    rows = []
    i = 0
    for w in base_words:
        rows.append((i, w)); i += 1
        # mutated sibling: 0-3 random edits
        s = list(w)
        for _ in range(rng.randint(0, 3)):
            op = rng.choice("ids")
            pos = rng.randint(0, max(len(s) - 1, 0))
            if op == "i":
                s.insert(pos, rng.choice(alpha))
            elif s:
                if op == "d":
                    del s[pos]
                else:
                    s[pos] = rng.choice(alpha)
        rows.append((i, "".join(s))); i += 1
    for d in (1, 2, 3):
        assert _fast(spark, rows, d) == _brute(spark, rows, d), f"d={d}"


def test_rejects_nonpositive_distance(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, txt string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, "txt", "id", max_dist=0)


def test_plan_has_no_nested_loop(spark):
    df = spark.createDataFrame(
        [(i, f"name {i}") for i in range(50)], "id bigint, txt string"
    )
    plan = (
        edit_distance_pairs(df, "txt", "id", max_dist=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_randomized_against_brute_high_distance(spark):
    """VERDICT r6 item #7: the probe count grows (2d+1)²(d+1) and the
    segment-layout edge cases multiply past d=3 — pin d=4 and d=5
    against brute force on an adversarial mix of short strings (length
    ≤ d, where every segment can be empty), heavy-edit siblings, and
    length gaps right at the |len_a − len_b| = d boundary."""
    rng = random.Random(11)
    alpha = "abc"  # tiny alphabet: collisions and near-misses abound
    rows = []
    i = 0
    for _ in range(25):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
        rows.append((i, w)); i += 1
        s = list(w)
        for _ in range(rng.randint(0, 5)):  # up to 5 edits: straddles d
            op = rng.choice("ids")
            pos = rng.randint(0, max(len(s) - 1, 0))
            if op == "i":
                s.insert(pos, rng.choice(alpha))
            elif s:
                if op == "d":
                    del s[pos]
                else:
                    s[pos] = rng.choice(alpha)
        rows.append((i, "".join(s))); i += 1
    # exact-boundary length gap: "" vs length-4 and length-5 strings
    rows += [(i, ""), (i + 1, "aaaa"), (i + 2, "aaaaa")]
    for d in (4, 5):
        assert _fast(spark, rows, d) == _brute(spark, rows, d), f"d={d}"
