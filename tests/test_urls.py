"""URL canonicalization contract pins (functions/urls.py) and the
keep-best URL dedup policy (operators/dedup.py::dedup_by_url) —
VERDICT r14 item 5. The property tests drive the tracking-param
stripping with generated param soups: canonicalization must keep
exactly the sorted non-tracking params, independent of order and of
how many tracking params are interleaved."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nycitibike_data_transform_spark.functions.urls import (
    TRACKING_PARAMS,
    canonical_url,
    url_host,
    url_scheme,
)
from nycitibike_data_transform_spark.operators.dedup import dedup_by_url


def _canon_one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url("url").alias("c")).first()["c"]


def test_canonicalization_contract_cases(spark):
    """The module contract, one pin per clause."""
    cases = {
        # scheme + host case, default port, www, trailing slash,
        # tracking params, param order, fragment — all at once
        "HTTPS://WWW.Example.COM:443/Docs/A/?b=2&utm_source=x&a=1#frag":
            "https://example.com/Docs/A?a=1&b=2",
        # already canonical → fixed point
        "https://example.com/Docs/A?a=1&b=2":
            "https://example.com/Docs/A?a=1&b=2",
        # http default port + bare-slash path
        "http://example.com:80/": "http://example.com",
        "http://example.com": "http://example.com",
        # NON-default port kept
        "https://other.com:8443/p": "https://other.com:8443/p",
        # other schemes keep their port (it is meaningful)
        "ftp://Host.com:21/file": "ftp://host.com:21/file",
        # fully-tracking query drops its '?'
        "https://example.com/p?utm_a=1&UTM_B=2&gclid=z&Ref=q":
            "https://example.com/p",
        # tracking keys match case-insensitively; survivors sorted
        "https://example.com/p?z=1&REF=ok&keep=2":
            "https://example.com/p?keep=2&z=1",
        # trailing-slash RUN stripped; path case preserved
        "https://example.com/A//": "https://example.com/A",
        # fragment with no path
        "https://example.com#frag": "https://example.com",
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (url, want) in enumerate(cases.items()):
        assert got[i] == want, url


def test_non_urls_and_null_canonicalize_to_null(spark):
    df = spark.createDataFrame(
        [(1, "not a url"), (2, "example.com/path"), (3, None), (4, "")],
        "i long, url string",
    )
    got = df.select("i", canonical_url("url").alias("c")).collect()
    assert all(r["c"] is None for r in got)


def test_scheme_and_host_helpers(spark):
    df = spark.createDataFrame(
        [("HtTpS://WWW.Foo.COM:443/x",), ("no-scheme",)], "url string"
    )
    rows = df.select(
        url_scheme("url").alias("s"), url_host("url").alias("h")
    ).collect()
    assert (rows[0]["s"], rows[0]["h"]) == ("https", "foo.com")
    assert (rows[1]["s"], rows[1]["h"]) == ("", "")


# --------------------------------------------------- property: param strip

_KEY = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
).filter(
    lambda k: k not in TRACKING_PARAMS and not k.startswith("utm_")
)
_TRACK = st.one_of(
    st.sampled_from(TRACKING_PARAMS),
    _KEY.map(lambda k: f"utm_{k}"),
)


@settings(max_examples=25, deadline=None)
@given(
    keep=st.lists(_KEY, min_size=0, max_size=5, unique=True),
    track=st.lists(_TRACK, min_size=0, max_size=5),
    seed=st.integers(0, 2**31),
)
def test_tracking_params_stripped_exactly(spark, keep, track, seed):
    """For ANY interleaving of kept and tracking params, the canonical
    query is exactly the kept params (with their values) sorted — no
    tracking param survives, no kept param is lost, order never
    matters. (The ``spark`` fixture is session-scoped, which hypothesis
    permits inside @given.)"""
    import random
    params = [f"{k}=v{i}" for i, k in enumerate(keep)] + [
        f"{t}=x" for t in track
    ]
    rng = random.Random(seed)
    rng.shuffle(params)
    url = "https://example.com/p" + ("?" + "&".join(params) if params else "")
    got = _canon_one(spark, url)
    want_params = sorted(f"{k}=v{i}" for i, k in enumerate(keep))
    want = "https://example.com/p" + (
        "?" + "&".join(want_params) if want_params else ""
    )
    assert got == want, url


# --------------------------------------------------------- dedup_by_url

def test_dedup_by_url_keep_best_and_singletons(spark):
    rows = [
        (1, "https://a.com/x?b=1&a=1", 10),
        (2, "HTTPS://WWW.A.com:443/x/?a=1&b=1&utm_k=9", 99),  # best copy
        (3, "https://a.com/x?a=1&b=1#frag", 50),
        (4, "https://b.com/y", 7),
        (5, "nope", 5),   # unparseable → singleton, NULL canonical
        (6, "nope", 5),   # a SECOND unparseable must also survive
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q long")
    got = {
        r["doc_id"]: (r["canonical_url"], r["group_size"])
        for r in dedup_by_url(df, quality_col="q").collect()
    }
    assert got == {
        2: ("https://a.com/x?a=1&b=1", 3),
        4: ("https://b.com/y", 1),
        5: (None, 1),
        6: (None, 1),
    }


def test_dedup_by_url_without_quality_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(9, "https://a.com/x"), (2, "https://a.com/x/")],
        "doc_id long, url string",
    )
    got = dedup_by_url(df).collect()
    assert [(r["doc_id"], r["group_size"]) for r in got] == [(2, 2)]
