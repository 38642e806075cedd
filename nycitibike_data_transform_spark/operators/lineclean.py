"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the
"colossal clean crawled corpus" rules).

The line-structure counterpart of the document-level quality filters
(``quality_filter``'s Gopher rules): web-extracted text is cleaned one
LINE at a time, then pages that lose too much are dropped entirely.
The public rule set implemented here:

- keep only lines ending in terminal punctuation (``. ! ? "``);
- drop lines with fewer than ``min_words`` words;
- drop lines containing the word "javascript" (case-insensitive) —
  boilerplate cookie/JS warnings;
- drop the whole page if it contains "lorem ipsum" or a curly brace
  ``{`` (template/code debris);
- drop the whole page if fewer than ``min_kept_lines`` lines survive
  (C4's three-sentence floor).

Everything is a pure Column pipeline — ``split`` / higher-order
``filter`` / ``array_join`` run inside codegen, zero UDF, one narrow
pass per document (no explode: lines never leave their row, so the
operator adds NO shuffle at any corpus size).

Registry note: the synthetic test corpus has no newline structure, so
the registry query (``c4_line_stats``) materializes a deterministic
line rendering first and then runs this real pipeline; the
javascript/lorem/brace rules are pinned by unit tests
(tests/test_lineclean.py) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = r'[.!?"]$'
_BAD_LINE_WORD = "javascript"
_BAD_PAGE_MARKS = ("lorem ipsum", "{")


def _line_ok(line: Column, min_words: int) -> Column:
    stripped = F.trim(line)
    words = F.size(F.split(stripped, r"\s+"))
    return (
        stripped.rlike(TERMINAL_PUNCT_RE)
        & (words >= min_words)
        & ~F.lower(stripped).contains(_BAD_LINE_WORD)
    )


def c4_line_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Apply the C4 line rules. Every input document emits a row:

    - ``n_lines_in`` / ``n_lines_kept`` — the per-page cut, auditable;
    - ``kept`` (int) — 1 iff the page survives (no page-level marks
      AND ``n_lines_kept >= min_kept_lines``);
    - ``clean_text`` — surviving lines rejoined with ``\\n``; NULL for
      dropped pages (callers filter ``kept = 1`` for the clean corpus).

    NULL text behaves like an empty page (0 lines, dropped)."""
    if min_words < 1 or min_kept_lines < 1:
        raise ValueError("min_words and min_kept_lines must be >= 1")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.when(F.length(txt) == 0, F.array().cast("array<string>")).otherwise(
        F.split(txt, "\n")
    )
    kept_lines = F.filter(lines, lambda l: _line_ok(l, min_words))
    page_bad = None
    for mark in _BAD_PAGE_MARKS:
        cond = F.lower(txt).contains(mark)
        page_bad = cond if page_bad is None else (page_bad | cond)
    kept = (~page_bad & (F.size(kept_lines) >= min_kept_lines)).cast("int")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines_in"),
        F.size(kept_lines).alias("n_lines_kept"),
        kept.alias("kept"),
        F.when(kept == 1, F.array_join(kept_lines, "\n"))
        .otherwise(F.lit(None).cast("string"))
        .alias("clean_text"),
    )
