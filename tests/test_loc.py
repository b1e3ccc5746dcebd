"""LOC accounting (pipeline/loc.py — the cloc/tokei role)."""

from __future__ import annotations

import pytest

from terrier_ef_spark.pipeline.loc import loc_by_lang, sloc_stats

PY = "import os\n\n# a comment\n   # indented comment\nx = 1  # trailing\n"
GO = "package main\n// comment\n\t// tab comment\n# not a go comment\n"
MD = "# md heading is NOT a comment (no marker for md)\n\ntext"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "py", PY), (2, "go", GO), (3, "md", MD)],
        "doc_id long, lang string, content string",
    )


def test_per_doc_counts(docs):
    got = sloc_stats(docs).toPandas().set_index("doc_id")
    # PY: 6 physical lines (trailing \n -> empty last), 2 blank,
    # 2 comment, 2 code ("import os", "x = 1  # trailing")
    assert tuple(got.loc[1][["n_lines", "n_blank", "n_comment", "n_code"]]) \
        == (6, 2, 2, 2)
    # GO: 5 lines, 1 blank (trailing), 2 // comments, 2 code
    # ("package main" and the "# not a go comment" line)
    assert tuple(got.loc[2][["n_lines", "n_blank", "n_comment", "n_code"]]) \
        == (5, 1, 2, 2)
    # MD: unknown syntax -> 0 comments, heading is code
    assert tuple(got.loc[3][["n_lines", "n_blank", "n_comment", "n_code"]]) \
        == (3, 1, 0, 2)


def test_no_lang_column(spark):
    d = spark.createDataFrame(
        [(1, "# looks like a comment\ncode")], "doc_id long, content string"
    )
    got = sloc_stats(d).toPandas()
    assert got.n_comment.iloc[0] == 0 and got.n_code.iloc[0] == 2


def test_rollup(docs):
    rep = loc_by_lang(docs).toPandas().set_index("lang")
    assert tuple(rep.loc["py"]) == (1, 6, 2, 2, 2)
    assert tuple(rep.loc["go"]) == (1, 5, 1, 2, 2)
    assert tuple(rep.loc["md"]) == (1, 3, 1, 0, 2)
    # identity: every line is blank, comment or code
    assert (rep.n_lines == rep.n_blank + rep.n_comment + rep.n_code).all()


def test_rollup_plan_single_fold(docs):
    plan = loc_by_lang(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial agg + final, no join
    assert "Join" not in plan


def test_guard(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id long, content string")
    with pytest.raises(ValueError, match="lang"):
        loc_by_lang(d)


def test_duckdb_twin_agrees(docs):
    import duckdb
    import pandas as pd

    from terrier_ef_spark.pipeline.loc import (
        loc_by_lang_sql_duckdb,
        sloc_sql_duckdb,
    )

    con = duckdb.connect()
    con.register("src", docs.toPandas())
    a = sloc_stats(docs).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = con.sql(sloc_sql_duckdb("src")).df().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    a2 = loc_by_lang(docs).toPandas().sort_values("lang") \
        .reset_index(drop=True)
    b2 = con.sql(loc_by_lang_sql_duckdb("src")).df() \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2.astype(a2.dtypes.to_dict()))
