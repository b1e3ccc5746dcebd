"""Field / site collapsing (query/collapse.py): cap results per
(qid, key) on a ranked list, re-rank survivors — the web-serving
one-or-two-per-host page rule as a post-ranking transform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.query.collapse import collapse_top_k


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "qid long, rank int, docid long, score double"
    )


def _keys(spark, rows):
    return spark.createDataFrame(rows, "docid long, key int")


def test_per_key_cap_and_rerank(spark):
    # qid 1: docids 1..6 ranked by rank; sites: 1,2,3 -> A(0); 4,5 -> B(1); 6 -> C(2)
    results = _ranked(
        spark,
        [(1, r, d, 10.0 - r) for r, d in enumerate([1, 2, 3, 4, 5, 6], start=1)],
    )
    keys = _keys(spark, [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 2)])
    out = collapse_top_k(results, keys, k=10, per_key=2).orderBy("rank").collect()
    # site A keeps docids 1,2 (rank 1,2); drops 3; B keeps 4,5; C keeps 6
    assert [(r.rank, r.docid, r.key) for r in out] == [
        (1, 1, 0), (2, 2, 0), (3, 4, 1), (4, 5, 1), (5, 6, 2)
    ]
    # scores survive untouched
    assert [r.score for r in out] == [9.0, 8.0, 6.0, 5.0, 4.0]


def test_per_key_one_site_monopoly(spark):
    # one site holds ranks 1-4; per_key=1 keeps only its best, the rest
    # of the page fills from other sites in original rank order
    results = _ranked(
        spark, [(1, r, 100 + r, 20.0 - r) for r in range(1, 7)]
    )
    keys = _keys(
        spark,
        [(101, 7), (102, 7), (103, 7), (104, 7), (105, 8), (106, 9)],
    )
    out = collapse_top_k(results, keys, k=3, per_key=1).orderBy("rank").collect()
    assert [(r.rank, r.docid) for r in out] == [(1, 101), (2, 105), (3, 106)]


def test_missing_key_docs_never_collapse(spark):
    # docids absent from doc_keys have no site identity: each is its
    # own group, so none of them are dropped even at per_key=1
    results = _ranked(spark, [(1, r, r, 10.0 - r) for r in range(1, 5)])
    keys = _keys(spark, [(1, 5)])  # only docid 1 has a key
    out = collapse_top_k(results, keys, k=10, per_key=1).orderBy("rank").collect()
    assert [r.docid for r in out] == [1, 2, 3, 4]
    assert out[0].key == 5 and all(r.key is None for r in out[1:])


def test_multi_query_independence(spark):
    # the same site cap applies per qid, not across the batch
    results = _ranked(
        spark,
        [(q, r, 10 * q + r, 5.0 - r) for q in (1, 2) for r in (1, 2)],
    )
    keys = _keys(spark, [(11, 3), (12, 3), (21, 3), (22, 3)])
    out = collapse_top_k(results, keys, k=10, per_key=2)
    assert out.groupBy("qid").count().orderBy("qid").rdd.map(
        lambda r: (r.qid, r["count"])
    ).collect() == [(1, 2), (2, 2)]


def test_k_cut_applies_after_collapse(spark):
    results = _ranked(spark, [(1, r, r, 10.0 - r) for r in range(1, 8)])
    keys = _keys(spark, [(d, d) for d in range(1, 8)])  # all distinct sites
    out = collapse_top_k(results, keys, k=4, per_key=1)
    assert out.count() == 4
    assert out.agg(F.max("rank")).collect()[0][0] == 4


def test_bad_args_rejected(spark):
    results = _ranked(spark, [(1, 1, 1, 1.0)])
    keys = _keys(spark, [(1, 1)])
    with pytest.raises(ValueError):
        collapse_top_k(results, keys, k=0)
    with pytest.raises(ValueError):
        collapse_top_k(results, keys, per_key=0)
