"""Score explanation (query/explain.py): per-term evidence whose sum
reproduces the scorer's result exactly, absent-term behavior, guards."""

from __future__ import annotations

import pytest

from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.explain import explain_scores

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
}

QUERIES = [
    {"qid": 1, "terms": ["spark", "table"]},
    {"qid": 2, "terms": ["common", "value", "zzzmissing"]},
]


@pytest.fixture(scope="module")
def exp_idx(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("explain") / "idx"),
        log2_quantum=3, n_partitions=2,
    )


def test_contribs_sum_to_score(exp_idx):
    res = run_queries(exp_idx, QUERIES, k=5, strategy="term_major").collect()
    pairs = [(r["qid"], r["docid"]) for r in res]
    rows = explain_scores(exp_idx, QUERIES, pairs).collect()
    sums: dict[tuple, float] = {}
    for r in rows:
        sums[(r["qid"], r["docid"])] = (
            sums.get((r["qid"], r["docid"]), 0.0) + r["contrib"]
        )
    for r in res:
        assert abs(sums[(r["qid"], r["docid"])] - r["score"]) < 1e-5, r


def test_evidence_values(exp_idx):
    rows = explain_scores(exp_idx, QUERIES, [(1, 0)]).collect()
    by_term = {r["term"]: r for r in rows}
    assert set(by_term) == {"spark", "table"}
    assert by_term["spark"]["tf"] == 2
    assert by_term["table"]["tf"] == 1
    assert by_term["spark"]["doclen"] == 5
    assert by_term["spark"]["df"] == 3  # docs 0, 2, 4
    assert by_term["spark"]["cf"] == 4  # 2 + 1 + 1


def test_absent_terms_yield_no_rows(exp_idx):
    """qid 2 carries 'zzzmissing'; no evidence row for it — the
    explanation mirrors the scorer's matched-term decomposition."""
    rows = explain_scores(exp_idx, QUERIES, [(2, 3)]).collect()
    assert {r["term"] for r in rows} == {"common", "value"}


def test_explain_guards(exp_idx):
    with pytest.raises(ValueError, match="no .* pairs"):
        explain_scores(exp_idx, QUERIES, [])
    with pytest.raises(ValueError, match="unknown qids"):
        explain_scores(exp_idx, QUERIES, [(99, 0)])
    with pytest.raises(ValueError, match="no query terms"):
        explain_scores(exp_idx, [], [(1, 0)])
