"""URL canonicalization for web-corpus pipelines (VERDICT r14 item 5).

Web-crawl training corpora carry the same page under many URL spellings
— scheme/host case, default ports, ``www.`` prefixes, trailing slashes,
tracking parameters, param order, fragments. Canonicalizing before
host/URL-level dedup is a training-data staple (the reference has no
web surface; north-star addition alongside SURVEY.md §2.9).

Everything here is a pure Column expression over portable primitives
(``regexp_extract`` / ``regexp_replace`` / ``split`` / ``filter`` /
``array_sort``) — zero UDF, stays inside whole-stage codegen, and the
DuckDB oracles replicate each step with the SAME regexes
(``list_filter`` / ``list_sort`` / ``array_to_string``).

Canonical form (documented contract, pinned by tests):

- scheme: lowercased; a string with no ``scheme://`` prefix is NOT a
  URL and canonicalizes to NULL (callers decide the retention policy —
  ``dedup_by_url`` keeps such rows as singletons).
- host: lowercased; ONE leading ``www.`` stripped; the scheme's default
  port stripped (``:80`` for http, ``:443`` for https — other schemes'
  ports are kept: they are meaningful).
- path: trailing-slash run stripped (``/docs/`` ≡ ``/docs``; a bare
  ``/`` path ≡ no path). Path case is preserved — unlike the host,
  path case is significant per RFC 3986.
- query: parameters split on ``&``; tracking parameters dropped
  (``utm_*`` prefix plus the exact keys in ``TRACKING_PARAMS``, matched
  case-insensitively on the key left of ``=``); the survivors SORTED
  lexicographically and rejoined — param order never distinguishes two
  URLs. An emptied query drops its ``?``.
- fragment: stripped (client-side only).

Out of scope (documented, not silently wrong): percent-encoding
normalization, IDN/punycode, and path ``.``/``..`` resolution — each
needs a real parser; a corpus needing them should materialize a
resolved-URL column upstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact tracking keys dropped from query strings (matched lowercase),
#: alongside the ``utm_*`` prefix family. The usual ad/mail-click and
#: social-share identifiers — none of them change the page content.
TRACKING_PARAMS: tuple[str, ...] = (
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "mc_cid",
    "igshid",
    "ref",
    "ref_src",
    "_ga",
)

#: the shared scheme regex — one definition, used by both the Spark
#: expressions below and the DuckDB oracle builders in queries/.
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme, or ``''`` when the string has none."""
    return F.lower(F.regexp_extract(_as_col(col), SCHEME_RE, 1))


def url_host(col: Column | str) -> Column:
    """Canonical host: lowercased authority (host[:port]) with the
    scheme's default port and one leading ``www.`` stripped. ``''``
    when the string is not a URL."""
    c = _as_col(col)
    rest = F.regexp_replace(c, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    scheme = url_scheme(c)
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    return F.when(scheme == "", F.lit("")).otherwise(
        F.regexp_replace(hostport, r"^www\.", "")
    )


def _clean_query(query: Column) -> Column:
    """Drop tracking params, sort the rest, rejoin — '' when emptied."""
    key = lambda p: F.lower(F.split(p, "=").getItem(0))  # noqa: E731
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~key(p).startswith("utm_")
        & ~key(p).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(col: Column | str) -> Column:
    """The canonical spelling per the module contract; NULL for NULL
    input or a string with no ``scheme://`` prefix."""
    c = _as_col(col)
    rest = F.regexp_replace(c, SCHEME_RE, "")
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1), r"/+$", ""
    )
    qs = _clean_query(F.regexp_extract(rest, r"^[^#?]*\?([^#]*)", 1))
    scheme = url_scheme(c)
    return F.when(c.isNull() | (scheme == ""), F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            url_host(c),
            path,
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        )
    )
