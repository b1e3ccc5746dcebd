"""Faceted search (query/facets.py): full-match-set value counts per
(query, facet field), top values per facet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.query.facets import facet_counts


@pytest.fixture(scope="module")
def facet_index(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    docs = {
        0: ("table cable", "en", "web"),
        1: ("table spark", "en", "web"),
        2: ("table spark spark", "fr", "web"),
        3: ("spark merge", "fr", "books"),
        4: ("merge merge", "de", "books"),
        5: ("orange banana", "en", None),  # null source: no bucket
    }
    rows = [
        ("r", f"f{d}", "c0", "t", t, d) for d, (t, _, _) in sorted(docs.items())
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("facets") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    fac = spark.createDataFrame(
        [(d, "lang", lang) for d, (_, lang, _) in docs.items()]
        + [(d, "source", src) for d, (_, _, src) in docs.items()],
        "docid long, facet string, value string",
    )
    return idx, fac


def test_counts_over_full_match_set(spark, facet_index):
    idx, fac = facet_index
    out = facet_counts(
        idx, [{"qid": 1, "terms": ["table", "spark"]}], fac
    ).collect()
    got = {(r.facet, r.value): (r.n_docs, r.rank) for r in out}
    # match set = docs 0,1,2,3 (disjunctive; doc 2's double 'spark'
    # counts once). lang: en 2 (docs 0,1), fr 2 (2,3); source: web 3, books 1
    assert got[("lang", "en")] == (2, 1)   # ties break value asc: en < fr
    assert got[("lang", "fr")] == (2, 2)
    assert got[("source", "web")] == (3, 1)
    assert got[("source", "books")] == (1, 2)
    assert len(out) == 4


def test_null_facet_values_form_no_bucket(spark, facet_index):
    idx, fac = facet_index
    out = facet_counts(
        idx, [{"qid": 1, "terms": ["orange"]}], fac
    ).collect()
    got = {(r.facet, r.value) for r in out}
    assert got == {("lang", "en")}  # doc 5's source is null: no row


def test_top_facets_cap_and_ordering(spark, facet_index):
    idx, fac = facet_index
    out = facet_counts(
        idx, [{"qid": 1, "terms": ["table", "spark", "merge"]}],
        fac, top_facets=2,
    )
    lang = (
        out.where(F.col("facet") == "lang").orderBy("rank").collect()
    )
    # match set docs 0-4: en 2, fr 2, de 1 -> top-2 keeps en, fr
    assert [(r.value, r.n_docs, r.rank) for r in lang] == [
        ("en", 2, 1), ("fr", 2, 2)
    ]


def test_multi_query_independence(spark, facet_index):
    idx, fac = facet_index
    out = facet_counts(
        idx,
        [{"qid": 1, "terms": ["table"]}, {"qid": 2, "terms": ["merge"]}],
        fac,
    )
    ql = {
        (r.qid, r.facet, r.value): r.n_docs
        for r in out.collect()
    }
    assert ql[(1, "source", "web")] == 3
    assert ql[(2, "source", "books")] == 2
    assert (2, "source", "web") not in ql


def test_guards(spark, facet_index):
    idx, fac = facet_index
    with pytest.raises(ValueError):
        facet_counts(idx, [{"qid": 1, "terms": ["x"]}], fac, top_facets=0)
    with pytest.raises(ValueError):
        facet_counts(idx, [{"qid": 1, "terms": []}], fac)


def test_tombstoned_docs_form_no_buckets(spark, tmp_path):
    """Deleted docs leave every facet count immediately (the
    run_queries respect_deletes convention) — a navigation bucket
    must not advertise documents retrieval will never return."""
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.maintenance import delete_docs

    rows = [
        ("r", "f0", "c0", "t", "table cable", 0),
        ("r", "f1", "c0", "t", "table spark", 1),
        ("r", "f2", "c0", "t", "merge", 2),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "idx"), log2_quantum=3, n_partitions=2,
    )
    fac = spark.createDataFrame(
        [(0, "lang", "en"), (1, "lang", "fr"), (2, "lang", "en")],
        "docid long, facet string, value string",
    )
    q = [{"qid": 1, "terms": ["table"]}]
    before = {
        (r.value): r.n_docs for r in facet_counts(idx, q, fac).collect()
    }
    assert before == {"en": 1, "fr": 1}
    delete_docs(idx, [0])
    after = {
        (r.value): r.n_docs for r in facet_counts(idx, q, fac).collect()
    }
    assert after == {"fr": 1}  # doc 0's en bucket vanished entirely
