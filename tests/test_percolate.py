"""Percolation / reverse search (query/percolate.py): stored queries
matched against a document relation — disjunctive and conjunctive
semantics, distinct-term hit counts, guards."""

from __future__ import annotations

import pytest

from terrier_ef_spark.query.percolate import percolate

DOCS = [
    (0, "alert spark cluster down"),
    (1, "spark spark spark"),          # repeats: presence counts once
    (2, "cluster maintenance window"),
    (3, "quiet unrelated text"),
    (4, ""),
]

QUERIES = [
    {"qid": 1, "terms": ["spark", "cluster"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["spark", "cluster"], "mode": "conjunctive"},
    {"qid": 3, "terms": ["maintenance"]},
    {"qid": 4, "terms": ["zzzmissing"], "mode": "conjunctive"},
]


@pytest.fixture(scope="module")
def doc_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _got(df):
    return {(r["qid"], r["doc_id"]): r["n_hit"] for r in df.collect()}


def test_percolate_semantics(doc_df):
    got = _got(percolate(doc_df, QUERIES))
    assert got == {
        (1, 0): 2,  # both terms present
        (1, 1): 1,  # spark only (tf 3 counts once)
        (1, 2): 1,  # cluster only
        (2, 0): 2,  # conjunctive: only the doc with BOTH
        (3, 2): 1,
    }


def test_percolate_matches_docid_independence(doc_df):
    """Repartitioning the doc relation changes nothing."""
    a = _got(percolate(doc_df, QUERIES))
    b = _got(percolate(doc_df.repartition(7), QUERIES))
    assert a == b


def test_percolate_guards(doc_df):
    with pytest.raises(ValueError, match="no stored queries"):
        percolate(doc_df, [])
    with pytest.raises(ValueError, match="has no terms"):
        percolate(doc_df, [{"qid": 1, "terms": []}])
    with pytest.raises(ValueError, match="duplicate qid"):
        percolate(doc_df, [{"qid": 1, "terms": ["a"]},
                           {"qid": 1, "terms": ["b"]}])
    with pytest.raises(ValueError, match="unknown mode"):
        percolate(doc_df, [{"qid": 1, "terms": ["a"], "mode": "phrase"}])
