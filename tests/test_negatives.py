"""Hard-negative mining (pipeline/negatives.py): positives excluded,
ranking preserved, per-query independence, depth behavior, guards."""

from __future__ import annotations

import pytest

from terrier_ef_spark.pipeline.negatives import mine_hard_negatives
from terrier_ef_spark.query.engine import run_queries

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
    5: "merge merge table value",
}

QUERIES = [
    {"qid": 1, "terms": ["spark", "table"]},
    {"qid": 2, "terms": ["merge"]},
]


@pytest.fixture(scope="module")
def neg_idx(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("negs") / "idx"),
        log2_quantum=3, n_partitions=2,
    )


def _stable(idx, queries):
    rows = run_queries(idx, queries, k=10, strategy="term_major").collect()
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append(
            (round(r["score"], 6), r["docid"])
        )
    for qid in out:
        out[qid].sort(key=lambda t: (-t[0], t[1]))
    return out


def test_negatives_are_top_nonrelevant(neg_idx, spark):
    full = _stable(neg_idx, QUERIES)
    # qid 1: its top doc AND doc 2 are relevant; qid 2: only its
    # second-ranked doc — so doc 2 (positive for qid 1) must still be
    # minable as qid 2's negative
    pos_rows = [(1, full[1][0][1]), (1, 2), (2, full[2][1][1])]
    pos = spark.createDataFrame(pos_rows, "qid long, docid long")
    got = {}
    for r in mine_hard_negatives(
        neg_idx, QUERIES, pos, n_neg=3
    ).orderBy("qid", "neg_rank").collect():
        got.setdefault(r["qid"], []).append((r["score"], r["docid"]))
    marked = {(q, d) for q, d in pos_rows}
    for qid in (1, 2):
        want = [
            (s, d) for s, d in full[qid] if (qid, d) not in marked
        ][:3]
        assert got[qid] == want
    assert 2 in {d for _, d in got[2]}  # cross-query positive still mined


def test_no_positives_yields_top_docs(neg_idx, spark):
    empty = spark.createDataFrame([], "qid long, docid long")
    full = _stable(neg_idx, QUERIES)
    got = {}
    for r in mine_hard_negatives(
        neg_idx, QUERIES, empty, n_neg=2
    ).orderBy("qid", "neg_rank").collect():
        got.setdefault(r["qid"], []).append((r["score"], r["docid"]))
    for qid in (1, 2):
        assert got[qid] == full[qid][:2]


def test_all_relevant_page_yields_nothing(neg_idx, spark):
    full = _stable(neg_idx, QUERIES)
    pos = spark.createDataFrame(
        [(2, d) for _, d in full[2]], "qid long, docid long"
    )
    got = mine_hard_negatives(neg_idx, [QUERIES[1]], pos, n_neg=3).collect()
    assert got == []


def test_negatives_guards(neg_idx, spark):
    pos = spark.createDataFrame([], "qid long, docid long")
    with pytest.raises(ValueError, match="n_neg"):
        mine_hard_negatives(neg_idx, QUERIES, pos, n_neg=0)
    with pytest.raises(ValueError, match="depth must be"):
        mine_hard_negatives(neg_idx, QUERIES, pos, n_neg=5, depth=3)
