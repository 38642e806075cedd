"""C4 line-rule cleaning (operators/lineclean.py)."""

from __future__ import annotations

import pytest

from nycitibike_data_transform_spark.operators.lineclean import c4_line_clean


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in c4_line_clean(df, **kw).collect()}


GOOD = "this line has plenty of words in it."


def test_c4_rules_line_level(spark):
    rows = [
        # three good lines -> page kept verbatim
        (1, "\n".join([GOOD, GOOD, GOOD])),
        # no terminal punctuation -> line dropped -> page falls under floor
        (2, "\n".join([GOOD, GOOD, "this line has no terminal punctuation at all"])),
        # too few words -> dropped
        (3, "\n".join([GOOD, GOOD, "too short."])),
        # javascript boilerplate -> dropped
        (4, "\n".join([GOOD, GOOD, "Please enable JavaScript to continue reading."])),
        # question/exclamation/quote all count as terminal
        (5, "\n".join(["is this a well formed question?",
                       "what an exciting well formed line!",
                       'he said "this line ends with a quote"'])),
    ]
    got = _run(spark, rows)
    assert got[1]["kept"] == 1 and got[1]["n_lines_kept"] == 3
    assert got[1]["clean_text"] == rows[0][1]
    for d in (2, 3, 4):
        assert got[d]["n_lines_in"] == 3
        assert got[d]["n_lines_kept"] == 2
        assert got[d]["kept"] == 0 and got[d]["clean_text"] is None
    assert got[5]["n_lines_kept"] == 3 and got[5]["kept"] == 1


def test_c4_rules_page_level(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    rows = [
        (1, three + "\nsome lorem ipsum filler text here."),
        (2, three + "\nfunction f() { return 1; }"),
        (3, three),
    ]
    got = _run(spark, rows)
    # page marks kill the page even though >= 3 lines survive the
    # line rules
    assert got[1]["kept"] == 0 and got[2]["kept"] == 0
    assert got[3]["kept"] == 1


def test_c4_blank_and_null_pages(spark):
    got = _run(spark, [(1, ""), (2, None)])
    for d in (1, 2):
        assert got[d]["n_lines_in"] == 0
        assert got[d]["n_lines_kept"] == 0
        assert got[d]["kept"] == 0
        assert got[d]["clean_text"] is None


def test_c4_thresholds_and_validation(spark):
    two = "\n".join([GOOD, GOOD])
    got = _run(spark, [(1, two)], min_kept_lines=2)
    assert got[1]["kept"] == 1
    got = _run(spark, [(1, "one two three.")], min_words=3, min_kept_lines=1)
    assert got[1]["kept"] == 1
    with pytest.raises(ValueError):
        _run(spark, [(1, "x")], min_words=0)
    with pytest.raises(ValueError):
        _run(spark, [(1, "x")], min_kept_lines=0)
