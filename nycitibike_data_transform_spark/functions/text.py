"""Text-analysis column functions (north-star additions, SURVEY.md §2.9).

Not present in the reference (its surface is pure relational SQL) —
these are the text operators a large-scale training-data pipeline
needs, built strictly from JVM-side expressions (split/regexp/length)
so they stay inside whole-stage codegen at 100 TB. No Python UDFs.

Cross-engine determinism note: every function here is also expressible
in ANSI SQL (see ``oracle_sql`` entries in ``__spark_entry__.py``); we
deliberately restrict ourselves to portable primitives (``replace``,
``length``, ``lower``, ``trim``, regex ``\\s+``) so the DuckDB oracle
computes bit-identical values.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the heuristic language id.
#: Scoring counts *occurrences* of each padded marker substring, which
#: both Spark and ANSI SQL can do with length/replace arithmetic.
LANGUAGE_MARKERS: Mapping[str, Sequence[str]] = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " la ", " de "),
    "fr": (" le ", " la ", " et "),
    "de": (" der ", " die ", " und "),
}


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """lower + collapse whitespace runs to single spaces + trim.
    Collapse-then-trim order matters: trim only strips 0x20 spaces, so
    edge tabs/newlines must be turned into spaces first."""
    return F.trim(F.regexp_replace(F.lower(_as_col(col)), r"\s+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0 tokens.
    NULL text stays NULL (mirrors the SQL oracles' propagation) —
    callers aggregating across documents should coalesce to 0."""
    c = normalize_text(col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, " "))).cast("int")


def token_array(col: Column | str) -> Column:
    """Whitespace tokens of normalized text; NULL/blank → empty array
    (downstream size/explode never see NULL). The shared tokenizer for
    the span, packing, and perplexity pipelines."""
    norm = F.coalesce(normalize_text(col), F.lit(""))
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def substring_occurrences(col: Column | str, needle: str) -> Column:
    """Occurrences of a literal substring via length/replace arithmetic
    (portable to any SQL engine, unlike regexp_count)."""
    c = _as_col(col)
    return (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / F.lit(len(needle))


def language_score(col: Column | str, lang: str) -> Column:
    """Marker-occurrence score for one language over normalized text,
    padded so word-boundary markers can match at the edges."""
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    markers = LANGUAGE_MARKERS[lang]
    score = None
    for m in markers:
        occ = substring_occurrences(padded, m)
        score = occ if score is None else score + occ
    return score.cast("double")


def language_id(col: Column | str) -> Column:
    """Heuristic language id: argmax of marker scores, deterministic
    tie-break by language code order; NULL when no marker hits."""
    scores = {lang: language_score(col, lang) for lang in sorted(LANGUAGE_MARKERS)}
    best = F.greatest(*scores.values())
    expr = F.when(best <= F.lit(0.0), F.lit(None).cast("string"))
    for lang in sorted(LANGUAGE_MARKERS):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit(None).cast("string"))


def punctuation_ratio(col: Column | str) -> Column:
    """Fraction of characters in a fixed, portable punctuation set."""
    c = _as_col(col)
    stripped = F.regexp_replace(c, r"[.,!?;:'\"()\[\]-]", "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        (F.length(c) - F.length(stripped)).cast("double") / F.length(c).cast("double")
    )


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are English stopwords (the/and/of/a/to/in)."""
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    hits = None
    for w in (" the ", " and ", " of ", " a ", " to ", " in "):
        occ = substring_occurrences(padded, w)
        hits = occ if hits is None else hits + occ
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def quality_score_columns(col: Column | str) -> dict[str, Column]:
    """The standard quality-signal bundle for a documents table:
    char length, token count, mean token length, punctuation ratio,
    stopword ratio. Returned as a dict of named Columns so callers
    select exactly what they need (column pruning stays effective)."""
    c = _as_col(col)
    n_tokens = token_count(col)
    n_chars = F.length(c).cast("int")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens == 0, F.lit(0.0)).otherwise(
            F.length(F.replace(normalize_text(col), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens.cast("double")
        ),
        "punct_ratio": punctuation_ratio(col),
        "stopword_ratio": stopword_ratio(col),
    }


#: portable scrub patterns (same regex dialect subset works in Java
#: regex and RE2): emails, URLs, long digit runs (phone/ID-ish).
SCRUB_PATTERNS: Mapping[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "long_number": (r"[0-9][0-9][0-9][0-9][0-9][0-9]+", "<NUM>"),
}


def scrub_pii(col: Column | str) -> Column:
    """Replace emails, URLs and long digit runs with typed placeholder
    tokens — the standard pre-training text-cleaning pass. Pure
    regexp_replace chain (codegen'd, shuffle-free)."""
    c = _as_col(col)
    for pattern, replacement in SCRUB_PATTERNS.values():
        c = F.regexp_replace(c, pattern, replacement)
    return c


def text_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized
    text. Engine-portable (md5 is standardized) unlike murmur-based
    ``F.hash``."""
    return F.md5(normalize_text(col))
