"""Composed code ranking (query/coderank.py): BM25 + symbol +
path evidence summed in one exact pass, verified by clean-room
recompute over the union of all three match sets."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.coderank import (
    combine_boost_pairs,
    run_queries_code_rank,
)
from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.pathrank import PATH_SPLIT_RE
from terrier_ef_spark.query.symbols import extract_symbols


@pytest.fixture(scope="module")
def cr(spark, tmp_path_factory):
    corpus = synthesize_corpus(spark, 220, seed=23, n_partitions=4).cache()
    out = str(tmp_path_factory.mktemp("cridx") / "i")
    idx = build_index(spark, corpus, out, n_partitions=4)
    sym = extract_symbols(corpus)
    words = ["def", "import", "zzqonlypath"]
    d = F.col("doc_id")
    dirname = (
        F.when(d % 3 == 0, words[0])
        .when(d % 3 == 1, words[1])
        .otherwise(words[2])
    )
    meta = corpus.select(
        "doc_id",
        F.concat(F.lit("lib/"), dirname, F.lit("/m"), d.cast("string"),
                 F.lit(".py")).alias("path"),
    ).cache()
    return idx, sym, sym.toPandas(), meta, meta.toPandas()


def test_combine_sums_duplicate_pairs(spark):
    a = spark.createDataFrame([(1, 10, 2.0), (1, 11, 1.0)],
                              "qid long, docid long, boost double")
    b = spark.createDataFrame([(1, 10, 0.5)],
                              "qid long, docid long, boost double")
    got = {(r["qid"], r["docid"]): r["boost"]
           for r in combine_boost_pairs(a, b).collect()}
    assert got == {(1, 10): 2.5, (1, 11): 1.0}
    with pytest.raises(ValueError, match="no channels"):
        combine_boost_pairs()


def test_code_rank_clean_room(cr):
    idx, sym, sym_pdf, meta, meta_pdf = cr
    queries = [
        {"qid": 1, "terms": ["def", "import"], "mode": "disjunctive"},
        {"qid": 2, "terms": ["zzqonlypath"], "mode": "disjunctive"},
    ]
    sym_beta, path_beta, k = 3.0, 1.5, 10
    deep = run_queries(idx, queries, k=10**6,
                       strategy="term_major").toPandas()
    scores = {(r["qid"], r["docid"]): r["score"]
              for _, r in deep.iterrows()}
    union: dict = dict(scores)
    for q in queries:
        terms = set(q["terms"])
        for t in terms:
            for d in set(sym_pdf[sym_pdf.symbol == t].doc_id):
                key = (q["qid"], d)
                union[key] = union.get(key, 0.0) + sym_beta
        for _, r in meta_pdf.iterrows():
            toks = {x for x in re.split(PATH_SPLIT_RE, r["path"].lower())
                    if x}
            n = len(terms & toks)
            if n:
                key = (q["qid"], r["doc_id"])
                union[key] = union.get(key, 0.0) + path_beta * n
    expect = {}
    for q in queries:
        rows = sorted(
            ((d, s) for (qid, d), s in union.items() if qid == q["qid"]),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        expect[q["qid"]] = rows
    got = run_queries_code_rank(
        idx, sym, meta, queries, k=k, sym_beta=sym_beta,
        path_beta=path_beta, strategy="term_major",
    ).toPandas()
    for qid, exp in expect.items():
        g = got[got.qid == qid].sort_values("rank")
        assert list(g["docid"]) == [d for d, _ in exp], qid
        for s_got, (_, s_exp) in zip(g["score"], exp):
            assert abs(s_got - s_exp) < 1e-9
    # all three evidence classes genuinely present: a filename-only
    # page (qid 2) and at least one doc with BOTH boosts on qid 1
    assert len(got[got.qid == 2]) > 0
    both = [
        key for key in union
        if key[0] == 1 and key in scores
        and union[key] - scores[key] >= sym_beta + path_beta
    ]
    assert both, "fixture too weak: no doc carries both boosts"
