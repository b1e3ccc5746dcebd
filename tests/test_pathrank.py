"""Path/filename ranking (query/pathrank.py — Zoekt's filename-match
signal): token-pair extraction vs a pure-Python oracle, full-outer
boosted rank identity including filename-only docs entering the page,
conjunctive content requirement, tombstone safety, and pure path
search."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.pathrank import (
    PATH_SPLIT_RE,
    path_search,
    path_term_pairs,
    run_queries_path_boost,
)


@pytest.fixture(scope="module")
def pr_corpus(spark):
    return synthesize_corpus(spark, 250, seed=17, n_partitions=4).cache()


@pytest.fixture(scope="module")
def pr_meta(pr_corpus):
    # controlled paths: a vocabulary word as the directory name, so
    # path tokens genuinely collide with query terms; dir word cycles
    # independently of content
    words = ["table", "import", "def", "merge", "zzqnowhere"]
    d = F.col("doc_id")
    dirname = (
        F.when(d % 5 == 0, words[0])
        .when(d % 5 == 1, words[1])
        .when(d % 5 == 2, words[2])
        .when(d % 5 == 3, words[3])
        .otherwise(words[4])
    )
    return pr_corpus.select(
        "doc_id",
        F.concat(
            F.lit("src/"), dirname, F.lit("/F"), d.cast("string"),
            F.lit(".PY"),
        ).alias("path"),
    ).cache()


QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["zzqnowhere"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["table", "merge"], "mode": "conjunctive"},
]


def _py_pairs(meta_pdf, queries, beta):
    out = {}
    for _, r in meta_pdf.iterrows():
        toks = {t for t in re.split(PATH_SPLIT_RE, r["path"].lower()) if t}
        for q in queries:
            n = len(set(q["terms"]) & toks)
            if n:
                out[(q["qid"], r["doc_id"])] = beta * n
    return out


def test_path_term_pairs_vs_python(pr_meta):
    got = {
        (r["qid"], r["docid"]): r["boost"]
        for r in path_term_pairs(pr_meta, QUERIES, beta=2.0).collect()
    }
    exp = _py_pairs(pr_meta.toPandas(), QUERIES, 2.0)
    assert got == exp
    assert len(got) > 50  # non-trivial: most docs path-match something
    # case fold + separator split: 'F123.PY' yields tokens f123/py, and
    # the zzqnowhere dir matches qid 2 exactly on its fifth of docs
    assert sum(1 for (q, _) in got if q == 2) == pr_meta.where(
        F.col("path").contains("zzqnowhere")
    ).count()


@pytest.fixture(scope="module")
def pr_index(spark, pr_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pridx") / "i")
    return build_index(spark, pr_corpus, out, n_partitions=4)


def test_path_boost_full_outer_identity(spark, pr_index, pr_meta):
    """score == BM25 (0 if no content match) + beta x |path-matched
    terms|, on the union of both match sets — clean-room recompute."""
    beta, k = 5.0, 10
    dq = [q for q in QUERIES if q["mode"] == "disjunctive"]
    deep = run_queries(
        pr_index, dq, k=10**6, strategy="term_major"
    ).toPandas()
    scores = {
        (r["qid"], r["docid"]): r["score"] for _, r in deep.iterrows()
    }
    boosts = _py_pairs(pr_meta.toPandas(), dq, beta)
    union = {}
    for key in set(scores) | set(boosts):
        union[key] = scores.get(key, 0.0) + boosts.get(key, 0.0)
    expect = {}
    for q in dq:
        rows = sorted(
            ((d, s) for (qid, d), s in union.items() if qid == q["qid"]),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        expect[q["qid"]] = rows
    got = run_queries_path_boost(
        pr_index, pr_meta, dq, k=k, beta=beta, strategy="term_major"
    ).toPandas()
    for qid, exp in expect.items():
        g = got[got.qid == qid].sort_values("rank")
        assert list(g["docid"]) == [d for d, _ in exp], qid
        for s_got, (_, s_exp) in zip(g["score"], exp):
            assert abs(s_got - s_exp) < 1e-9
    # the filename-only class actually occurred: some returned doc has
    # no content match for its query
    matched = set(scores)
    assert any(
        (qid, d) not in matched
        for qid, g in got.groupby("qid")
        for d in g["docid"]
    ), "fixture too weak: no filename-only doc entered a page"


def test_conjunctive_keeps_content_requirement(pr_index, pr_meta):
    """A conjunctive query's boost-only docs are dropped (nhit filter):
    results are exactly the conjunctive content matches, re-scored
    with the boost."""
    cq = [q for q in QUERIES if q["mode"] == "conjunctive"]
    plain = run_queries(
        pr_index, cq, k=10**6, strategy="term_major"
    ).toPandas()
    got = run_queries_path_boost(
        pr_index, pr_meta, cq, k=10**6, beta=100.0, strategy="term_major"
    ).toPandas()
    assert set(got["docid"]) == set(plain["docid"])


def test_boost_only_doc_respects_tombstones(spark, pr_corpus, pr_meta,
                                            tmp_path_factory):
    """A deleted doc must not re-enter through its filename."""
    from terrier_ef_spark.index.maintenance import delete_docs

    out = str(tmp_path_factory.mktemp("prtomb") / "i")
    idx = build_index(spark, pr_corpus, out, n_partitions=4, block_bits=5)
    # qid 2's matches are filename-only (zzqnowhere is not a content
    # token) — delete one of them and it must vanish from the page
    q = [{"qid": 2, "terms": ["zzqnowhere"], "mode": "disjunctive"}]
    before = run_queries_path_boost(
        idx, pr_meta, q, k=5, beta=1.0, strategy="term_major"
    ).collect()
    assert before, "fixture: filename-only page empty"
    victim = before[0]["docid"]
    delete_docs(idx, [victim])
    after = run_queries_path_boost(
        idx, pr_meta, q, k=5, beta=1.0, strategy="term_major"
    ).collect()
    assert victim not in {r["docid"] for r in after}
    assert after, "other filename-only docs still serve"


def test_path_search_ranking(pr_meta):
    got = path_search(pr_meta, [{"qid": 1, "terms": ["import", "src"]}],
                      k=7).toPandas()
    exp_pairs = _py_pairs(
        pr_meta.toPandas(), [{"qid": 1, "terms": ["import", "src"]}], 1.0
    )
    exp = sorted(
        ((d, int(b)) for (_, d), b in exp_pairs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:7]
    assert list(got.sort_values("rank")["docid"]) == [d for d, _ in exp]
    assert list(got.sort_values("rank")["n_hits"]) == [n for _, n in exp]
    # 2-hit docs (src + import dir) outrank 1-hit (src only)
    assert got["n_hits"].max() == 2
