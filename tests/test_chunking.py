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


# ---------------------------------------------- content-defined chunks

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from nycitibike_data_transform_spark.operators.chunking import cdc_chunks


def _py_cdc(text, window=4):
    """Pure-Python reference: boundary after token i when the md5 of
    the trailing `window`-token slice starts with '0'."""
    if not text or not text.strip():
        return []
    w = text.lower().split()
    chunks, cur = [], []
    for i in range(1, len(w) + 1):
        cur.append(w[i - 1])
        if i >= window:
            win = " ".join(w[i - window : i])
            if hashlib.md5(win.encode()).hexdigest()[0] == "0":
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _mkdoc(seed, n):
    import random

    rng = random.Random(seed)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def test_cdc_matches_python_reference(spark):
    rows = [(i, _mkdoc(i, n)) for i, n in enumerate([0, 1, 3, 4, 20, 80, 200])]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["chunk_text"],
            r["n_chunk_tokens"],
        )
    for did, text in rows:
        expected = _py_cdc(text)
        chunks = got.get(did, {})
        assert sorted(chunks.keys()) == list(range(1, len(expected) + 1)), did
        for cid, exp in enumerate(expected, start=1):
            assert chunks[cid] == (exp, len(exp.split())), (did, cid)


def test_cdc_round_trip_and_hash(spark):
    rows = [(1, _mkdoc(7, 120))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(cdc_chunks(df).collect(), key=lambda r: r["chunk_id"])
    rebuilt = " ".join(r["chunk_text"] for r in out)
    assert rebuilt == rows[0][1].lower()
    for r in out:
        assert r["chunk_hash"] == hashlib.md5(r["chunk_text"].encode()).hexdigest()


def test_cdc_insertion_stability(spark):
    base = _mkdoc(42, 300)
    edited = "injected tokens at the head " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    by_doc = {1: set(), 2: set()}
    for r in cdc_chunks(df).collect():
        by_doc[r["doc_id"]].add(r["chunk_hash"])
    shared = by_doc[1] & by_doc[2]
    # the edit must only disturb chunks up to the next boundary: the
    # overwhelming majority of chunk hashes survive the insertion
    assert len(shared) >= len(by_doc[1]) - 2
    # fixed-size chunking loses EVERY chunk after a 5-token shift —
    # sanity-check the contrast claim on the same pair
    from nycitibike_data_transform_spark.operators.chunking import chunk_documents

    fixed = {1: set(), 2: set()}
    for r in chunk_documents(df, 16).collect():
        fixed[r["doc_id"]].add(hashlib.md5(r["chunk_text"].encode()).hexdigest())
    assert len(fixed[1] & fixed[2]) <= 1


def test_cdc_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc_chunks(df, window=0)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.sampled_from(WORDS), min_size=0, max_size=60).map(" ".join))
def test_cdc_differential(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(cdc_chunks(df).collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in got] == _py_cdc(text)
