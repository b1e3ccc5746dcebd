"""Tunable BM25 k1/b (Terrier's configurable weighting-model
parameters): every strategy and pruning algorithm must stay rank- AND
score-identical to a clean-room recompute at non-default parameters,
and the build-time values recorded in stats.json must be the default
at query time."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.engine import decode_postings, run_queries

QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "return"], "mode": "conjunctive"},
    {"qid": 3, "terms": ["the"], "mode": "disjunctive"},
]


@pytest.fixture(scope="module")
def tuned_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bm25params")
    corpus = synthesize_corpus(spark, 120, seed=55, n_partitions=4)
    idx = build_index(spark, corpus, str(root / "i"), block_bits=5,
                      n_partitions=4, k1=2.0, b=0.3)
    rows = decode_postings(idx).toPandas()
    dl = {r["docid"]: r["doclen"] for r in idx.docs.collect()}
    return idx, rows, dl


def _clean_room(idx, rows, dl, terms, mode, k1, b, k=10):
    N, avgdl = idx.stats["num_docs"], idx.stats["avgdl"]
    per: dict = {}
    for t in terms:
        sub = rows[rows.term == t]
        idf = np.log2((N - len(sub) + 0.5) / (len(sub) + 0.5))
        for _, r in sub.iterrows():
            tfn = r.tf * (k1 + 1) / (
                k1 * (1 - b + b * dl[r.docid] / avgdl) + r.tf
            )
            per.setdefault(r.docid, {})[t] = idf * tfn
    out = {
        d: sum(m.values())
        for d, m in per.items()
        if mode != "conjunctive" or len(m) == len(terms)
    }
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.mark.parametrize("k1,b", [(2.0, 0.3), (0.8, 0.9)])
def test_all_paths_score_identical_at_tuned_params(spark, tuned_idx, k1, b):
    idx, rows, dl = tuned_idx
    expect = {
        q["qid"]: _clean_room(idx, rows, dl, q["terms"], q["mode"], k1, b)
        for q in QUERIES
    }
    for kw in (
        dict(strategy="term_major"),
        dict(strategy="query_major"),
        dict(algo="bmw"),
        dict(algo="maxscore"),
        dict(algo="bmw", strategy="term_major"),
    ):
        res = run_queries(idx, QUERIES, k=10, k1=k1, b=b, **kw).collect()
        got: dict = {}
        for r in res:
            got.setdefault(r["qid"], []).append((r["docid"], r["score"]))
        for qid, g in got.items():
            w = expect[qid]
            assert [x[0] for x in g] == [x[0] for x in w], (kw, qid)
            assert all(abs(a[1] - e[1]) < 1e-9 for a, e in zip(g, w)), (kw, qid)


def test_build_time_params_are_query_default(spark, tuned_idx):
    idx, _, _ = tuned_idx
    assert idx.stats["k1"] == 2.0 and idx.stats["b"] == 0.3
    r_default = run_queries(idx, QUERIES, k=10).collect()
    r_explicit = run_queries(idx, QUERIES, k=10, k1=2.0, b=0.3).collect()
    assert sorted(map(tuple, r_default)) == sorted(map(tuple, r_explicit))
    # and they genuinely differ from the module-default parameters
    r_12 = run_queries(idx, QUERIES, k=10, k1=1.2, b=0.75).collect()
    assert sorted(map(tuple, r_default)) != sorted(map(tuple, r_12))
