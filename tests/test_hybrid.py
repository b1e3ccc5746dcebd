"""Hybrid RRF fusion: unit semantics + differential vs a hand-computed
Python fusion of the engine's own two ranked lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.pipeline import hybrid


def _ranked_df(spark, rows):
    return spark.createDataFrame(rows, "id long, rank int")


def test_rrf_fuse_semantics(spark):
    # doc 1 is rank 1 in both lists; doc 2 only in list A; doc 3 only in B
    a = _ranked_df(spark, [(1, 1), (2, 2)])
    b = _ranked_df(spark, [(1, 1), (3, 2)])
    out = {r["id"]: r for r in hybrid.rrf_fuse([a, b], k=10).collect()}
    assert out[1]["rank"] == 1
    assert out[1]["rrf_score"] == pytest.approx(2 / 61, abs=1e-9)
    # 2 and 3 have identical contributions (rank 2 in one list each):
    # tie broken by id asc
    assert out[2]["rrf_score"] == out[3]["rrf_score"] == pytest.approx(1 / 62, abs=1e-9)
    assert out[2]["rank"] == 2 and out[3]["rank"] == 3


def test_rrf_fuse_three_lists_and_k(spark):
    lists = [
        _ranked_df(spark, [(i, r + 1) for r, i in enumerate(order)])
        for order in ([1, 2, 3], [2, 1, 3], [3, 2, 1])
    ]
    rows = hybrid.rrf_fuse(lists, k=2).collect()
    assert len(rows) == 2
    # doc 2 has ranks (2,1,2) -> highest fused score
    by_rank = {r["rank"]: r["id"] for r in rows}
    assert by_rank[1] == 2


def test_rrf_fuse_empty_raises(spark):
    with pytest.raises(ValueError):
        hybrid.rrf_fuse([])


def test_hybrid_matches_python_fusion(spark, small_index, small_corpus):
    """End-to-end: hybrid_bm25_cosine_topk == RRF recomputed in Python
    from the engine's own deep BM25 list and the cosine list."""
    import numpy as np

    from terrier_ef_spark.pipeline.similarity import cosine_topk
    from terrier_ef_spark.query.engine import run_queries

    n = small_corpus.count()
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, 8)).round(3)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    qvec = [float(x) for x in vecs[0]]
    terms = ["import", "def"]
    depth, k_rrf = 20, 60

    got = sorted(
        hybrid.hybrid_bm25_cosine_topk(
            small_index, emb, terms, qvec, k=10, depth=depth, k_rrf=k_rrf
        ).collect(),
        key=lambda r: r["rank"],
    )

    # hand fusion from the two constituent lists (6dp-stable ranks)
    lex_deep = run_queries(
        small_index, [{"qid": 1, "terms": terms, "mode": "disjunctive"}],
        k=2 * depth, strategy="term_major",
    ).collect()
    lex_sorted = sorted(lex_deep, key=lambda r: (-round(r["score"], 6), r["docid"]))
    lex_rank = {r["docid"]: i + 1 for i, r in enumerate(lex_sorted[:depth])}
    sem = cosine_topk(emb, qvec, k=depth).collect()
    sem_rank = {r["vec_id"]: r["rank"] for r in sem}

    fused: dict[int, float] = {}
    for ranks in (lex_rank, sem_rank):
        for i, r in ranks.items():
            fused[i] = fused.get(i, 0.0) + 1.0 / (k_rrf + r)
    expect = sorted(fused.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]

    assert [(r["id"], r["rank"]) for r in got] == [
        (i, rk + 1) for rk, (i, _) in enumerate(expect)
    ]
    for r, (_, s) in zip(got, expect):
        assert r["rrf_score"] == pytest.approx(s, abs=1e-9)
    # sanity: the fusion actually mixes both modalities
    got_ids = {r["id"] for r in got}
    assert got_ids & set(lex_rank) and got_ids & set(sem_rank)


# ---- Comb fusion (Fox & Shaw TREC-2; Lee SIGIR'97 normalization) ----


def _scored_df(spark, rows):
    return spark.createDataFrame(rows, "id long, score double")


def test_comb_sum_minmax_semantics(spark):
    # list A: 1 -> 1.0 (max), 2 -> 0.0 (min); list B: 1 -> 1.0, 3 -> 0.0
    a = _scored_df(spark, [(1, 10.0), (2, 4.0)])
    b = _scored_df(spark, [(1, 0.9), (3, 0.1)])
    out = {r["id"]: r for r in hybrid.comb_fuse([a, b], k=10).collect()}
    assert out[1]["fused_score"] == pytest.approx(2.0)
    assert out[1]["n_lists"] == 2 and out[1]["rank"] == 1
    assert out[2]["fused_score"] == 0.0 and out[3]["fused_score"] == 0.0
    # zero-score tie broken by id asc
    assert out[2]["rank"] == 2 and out[3]["rank"] == 3


def test_comb_mnz_rewards_agreement(spark):
    # doc 1 mid in both lists beats doc 2 top of one list under MNZ
    a = _scored_df(spark, [(2, 10.0), (1, 6.0), (4, 2.0)])
    b = _scored_df(spark, [(3, 1.0), (1, 0.6), (5, 0.2)])
    s = {r["id"]: r for r in hybrid.comb_fuse([a, b], k=10, method="sum").collect()}
    m = {r["id"]: r for r in hybrid.comb_fuse([a, b], k=10, method="mnz").collect()}
    assert m[1]["fused_score"] == pytest.approx(2 * s[1]["fused_score"])
    assert m[2]["fused_score"] == s[2]["fused_score"]  # single-list: x1
    assert m[1]["rank"] == 1


def test_comb_anz_averages(spark):
    a = _scored_df(spark, [(1, 2.0), (2, 1.0)])
    b = _scored_df(spark, [(1, 4.0), (3, 1.0)])
    s = {r["id"]: r for r in hybrid.comb_fuse([a, b], k=10, method="anz").collect()}
    assert s[1]["fused_score"] == pytest.approx(1.0)  # (1 + 1)/2


def test_normalize_degenerate_and_zscore(spark):
    const = _scored_df(spark, [(1, 5.0), (2, 5.0)])
    mm = {r["id"]: r["nscore"] for r in hybrid.normalize_scores(const).collect()}
    assert mm == {1: 1.0, 2: 1.0}
    zs = {
        r["id"]: r["nscore"]
        for r in hybrid.normalize_scores(const, "zscore").collect()
    }
    assert zs == {1: 0.0, 2: 0.0}
    spread = _scored_df(spark, [(1, 1.0), (2, 3.0)])
    z = {r["id"]: r["nscore"] for r in hybrid.normalize_scores(spread, "zscore").collect()}
    assert z[1] == pytest.approx(-1.0) and z[2] == pytest.approx(1.0)


def test_comb_fuse_rejects_bad_args(spark):
    a = _scored_df(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        hybrid.comb_fuse([])
    with pytest.raises(ValueError):
        hybrid.comb_fuse([a], method="nope")
    with pytest.raises(ValueError):
        hybrid.normalize_scores(a, "nope")


def test_hybrid_combsum_matches_python(spark, small_index, small_corpus):
    """End-to-end: hybrid_bm25_cosine_combsum == minmax CombSUM
    recomputed in Python from the engine's own 6dp lists."""
    import numpy as np

    from terrier_ef_spark.pipeline.similarity import cosine_topk
    from terrier_ef_spark.query.engine import run_queries

    n = small_corpus.count()
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, 8)).round(3)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    terms = ["alpha", "beta"]
    qvec = [float(x) for x in vecs[0]]
    depth = 5

    deep = run_queries(
        small_index, [{"qid": 1, "terms": terms, "mode": "disjunctive"}],
        k=2 * depth, strategy="term_major",
    ).toPandas()
    deep["s6"] = deep["score"].round(6)
    lex = deep.sort_values(["s6", "docid"], ascending=[False, True]).head(depth)
    sem = (
        cosine_topk(emb, qvec, k=depth)
        .toPandas()
        .rename(columns={"vec_id": "docid", "cos": "s6"})
    )

    def norm(pdf):
        lo, hi = pdf["s6"].min(), pdf["s6"].max()
        return {
            int(r.docid): (1.0 if hi == lo else (r.s6 - lo) / (hi - lo))
            for r in pdf.itertuples(index=False)
        }

    ln, sn = norm(lex), norm(sem)
    fused = {}
    for d in set(ln) | set(sn):
        fused[d] = round(ln.get(d, 0.0) + sn.get(d, 0.0), 9)
    want = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:4]

    got = (
        hybrid.hybrid_bm25_cosine_combsum(
            small_index, emb, terms, qvec, k=4, depth=depth
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["id"], r["fused_score"]) for r in got] == [
        (d, pytest.approx(s, abs=1e-9)) for d, s in want
    ]
