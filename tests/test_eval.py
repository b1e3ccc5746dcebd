"""IR evaluation metrics (query/eval.py) vs hand-computed trec_eval
semantics on a fixed run + qrels, plus the edge cases that define the
conventions: unretrieved relevant docs count against AP, queries with
no relevant docs are excluded, RR is 0 when nothing relevant is
retrieved, nDCG's ideal is min(R, k) ones at the top."""

from __future__ import annotations

import math

import pytest


def _dfs(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(run_rows, "qid long, docid long, rank int")
    qrels = spark.createDataFrame(qrel_rows, "qid long, docid long")
    return run, qrels


def test_metrics_hand_computed(spark):
    from terrier_ef_spark.query.eval import evaluate_run, mean_metrics

    # qid 1: run = [10(R), 11, 12(R), 13, 14]; R = 3 (doc 99 unretrieved)
    # qid 2: run = [20, 21, 22]; qrels = {23} -> nothing retrieved
    # qid 3: no qrels -> excluded
    run_rows = (
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5)]
        + [(2, 20, 1), (2, 21, 2), (2, 22, 3)]
        + [(3, 30, 1)]
    )
    qrel_rows = [(1, 10), (1, 12), (1, 99), (2, 23)]
    run, qrels = _dfs(spark, run_rows, qrel_rows)
    got = {r["qid"]: r for r in evaluate_run(run, qrels, k=5).collect()}

    assert set(got) == {1, 2}

    g1 = got[1]
    assert g1["num_rel"] == 3 and g1["num_rel_ret"] == 2
    assert g1["p_at_k"] == pytest.approx(2 / 5)
    assert g1["rr"] == pytest.approx(1.0)
    # AP = (1/1 + 2/3) / R=3
    assert g1["ap"] == pytest.approx(round((1.0 + 2 / 3) / 3, 6))
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))  # min(R, k) = 3
    assert g1["ndcg_at_k"] == pytest.approx(round(dcg / idcg, 6))

    g2 = got[2]
    assert g2["num_rel"] == 1 and g2["num_rel_ret"] == 0
    assert g2["p_at_k"] == 0.0 and g2["rr"] == 0.0 and g2["ap"] == 0.0
    assert g2["ndcg_at_k"] == 0.0

    m = mean_metrics(evaluate_run(run, qrels, k=5)).collect()[0]
    assert m["n_queries"] == 2
    assert m["map"] == pytest.approx(round((g1["ap"] + 0.0) / 2, 6), abs=1e-6)
    assert m["mrr"] == pytest.approx(0.5)


def test_ideal_dcg_caps_at_k(spark):
    """R > k: the ideal prefix is k ones, so a run with all top-k
    relevant scores nDCG exactly 1."""
    from terrier_ef_spark.query.eval import evaluate_run

    k = 3
    run_rows = [(1, d, r + 1) for r, d in enumerate(range(10, 16))]
    qrel_rows = [(1, d) for d in range(10, 16)]  # R = 6 > k
    run, qrels = _dfs(spark, run_rows, qrel_rows)
    g = evaluate_run(run, qrels, k=k).collect()[0]
    assert g["ndcg_at_k"] == pytest.approx(1.0)
    assert g["p_at_k"] == pytest.approx(1.0)


def test_perfect_and_worst_ordering(spark):
    from terrier_ef_spark.query.eval import evaluate_run

    qrel_rows = [(1, 1), (2, 1)]
    run_rows = [(1, 1, 1), (1, 2, 2), (2, 2, 1), (2, 1, 2)]
    run, qrels = _dfs(spark, run_rows, qrel_rows)
    got = {r["qid"]: r for r in evaluate_run(run, qrels, k=2).collect()}
    assert got[1]["ap"] == pytest.approx(1.0)
    assert got[2]["ap"] == pytest.approx(0.5)
    assert got[1]["rr"] == 1.0 and got[2]["rr"] == 0.5
    assert got[1]["ndcg_at_k"] == pytest.approx(1.0)
    assert got[2]["ndcg_at_k"] == pytest.approx(
        round((1 / math.log2(3)) / 1.0, 6)
    )


def test_qpp_predictors_hand_computed(small_index, small_oracle):
    """Pre-retrieval predictors vs a hand computation from the oracle
    index's statistics; dispersion block vs the engine's own stable
    top-k."""
    from terrier_ef_spark.query.eval import qpp_predictors

    queries = [
        {"qid": 1, "terms": ["import", "def"]},
        {"qid": 2, "terms": ["the", "the", "val"]},   # qtf = 2 for 'the'
        {"qid": 3, "terms": ["zzz_absent_zzz"]},       # excluded: no stats
    ]
    got = {r["qid"]: r for r in qpp_predictors(small_index, queries,
                                               k=5).collect()}
    assert set(got) == {1, 2}

    N = small_oracle.num_docs
    C = small_oracle.num_tokens

    def idf(t):
        return math.log2((N + 1) / (len(small_oracle.postings[t]) + 0.5))

    def ictf(t):
        return math.log2(C / small_oracle.cf(t))

    g1 = got[1]
    assert g1["n_terms"] == 2
    assert g1["avg_idf"] == pytest.approx(
        round((idf("import") + idf("def")) / 2, 6), abs=1e-6)
    assert g1["max_idf"] == pytest.approx(
        round(max(idf("import"), idf("def")), 6), abs=1e-6)
    assert g1["avg_ictf"] == pytest.approx(
        round((ictf("import") + ictf("def")) / 2, 6), abs=1e-6)
    scs = sum(
        0.5 * math.log2(0.5 / (small_oracle.cf(t) / C))
        for t in ("import", "def")
    )
    assert g1["scs"] == pytest.approx(round(scs, 6), abs=1e-6)

    # qtf weighting in SCS: P(the|Q) = 2/3, P(val|Q) = 1/3
    g2 = got[2]
    assert g2["n_terms"] == 2
    scs2 = (2 / 3) * math.log2((2 / 3) / (small_oracle.cf("the") / C)) + (
        1 / 3
    ) * math.log2((1 / 3) / (small_oracle.cf("val") / C))
    assert g2["scs"] == pytest.approx(round(scs2, 6), abs=1e-6)

    # dispersion block: recompute from the oracle's own BM25 top-5
    for qid, terms in ((1, ["import", "def"]),):
        ranked = small_oracle.bm25_topk(terms, k=1000)
        s6 = sorted(
            (round(s, 6) for _, s in ranked), reverse=True
        )[:5]
        mean = sum(s6) / len(s6)
        var = sum((x - mean) ** 2 for x in s6) / len(s6)
        assert got[qid]["topk_mean"] == pytest.approx(round(mean, 6),
                                                      abs=1e-5)
        assert got[qid]["topk_std"] == pytest.approx(
            round(math.sqrt(var), 6), abs=1e-5)
        assert got[qid]["score_cv"] == pytest.approx(
            round(got[qid]["topk_std"] / got[qid]["topk_mean"], 6),
            abs=1e-5)
