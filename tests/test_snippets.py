"""Snippet best-window extraction: known-geometry corpus."""

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.snippets import best_windows


@pytest.fixture(scope="module")
def snip_index(spark, tmp_path_factory):
    # doc 0: 'alpha' at 0 and 30, 'beta' at 32 — only window start=30
    #        (or 32-anchored? no: anchor must be a term pos; start=30
    #        covers both) holds both terms
    # doc 1: 'alpha' at 5 only
    # doc 2: 'alpha' ... 'beta' 15 apart — no 10-window holds both
    filler = ["pad%d" % i for i in range(60)]
    t0 = list(filler)
    t0[0], t0[30], t0[32] = "alpha", "alpha", "beta"
    t1 = list(filler)
    t1[5] = "alpha"
    t2 = list(filler)
    t2[10], t2[25] = "alpha", "beta"
    rows = [(i, " ".join(t)) for i, t in enumerate((t0, t1, t2))]
    corpus = spark.createDataFrame(rows, "doc_id long, content string").select(
        F.lit("r").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.lit("py").alias("lang"),
        "content",
        "doc_id",
    )
    out = str(tmp_path_factory.mktemp("snip") / "idx")
    return build_index(spark, corpus, out, positions=True, n_partitions=2)


def test_best_windows_geometry(spark, snip_index):
    queries = [{"qid": 1, "terms": ["alpha", "beta"], "mode": "disjunctive"}]
    res = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2)], "qid long, docid long"
    )
    got = {
        r["docid"]: (r["start"], r["n_terms"])
        for r in best_windows(snip_index, queries, res, window=10).collect()
    }
    assert got[0] == (30, 2)  # covers alpha@30 and beta@32, earliest max
    assert got[1] == (5, 1)
    assert got[2] == (10, 1)  # no window holds both; earliest anchor wins


def test_best_windows_end_to_end(spark, snip_index):
    queries = [{"qid": 7, "terms": ["alpha", "beta"], "mode": "disjunctive"}]
    res = run_queries(snip_index, queries, k=3).select("qid", "docid")
    out = best_windows(snip_index, queries, res, window=10).collect()
    assert {r["docid"] for r in out} == {0, 1, 2}
    assert all(r["qid"] == 7 for r in out)
