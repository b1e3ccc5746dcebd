"""Proximity-boosted BM25 re-ranking: exact scores vs a clean-room
Python mirror, and the adjacent-beats-scattered property."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.phrase import run_queries_bm25_prox

# doc1: query terms adjacent, repeatedly; doc2: same tf but scattered
# far apart; doc3/4/5: background (df, avgdl ballast)
DOCS = {
    0: "alpha beta filler filler filler filler filler filler",
    1: "alpha beta filler alpha beta filler filler filler",
    2: "alpha filler filler filler beta filler alpha beta",
    3: "gamma delta filler filler filler filler filler filler",
    4: "gamma filler delta filler gamma filler filler filler",
    5: "delta filler filler filler filler filler filler gamma",
    6: "epsilon zeta filler filler filler filler filler filler",
    7: "zeta filler epsilon filler filler filler filler filler",
    8: "epsilon filler filler zeta filler filler filler filler",
    9: "zeta epsilon filler filler filler filler filler filler",
}
K1, B = 1.2, 0.75
WINDOW = 4


def _mirror(query_terms, depth=20):
    toks = {d: c.split() for d, c in DOCS.items()}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for d in toks.values() if t in d)
          for t in set(w for ts in toks.values() for w in ts)}

    def idf(t):
        return math.log2((n - df[t] + 0.5) / (df[t] + 0.5))

    base = {}
    for d, ts in toks.items():
        s = 0.0
        for term in query_terms:
            tf = ts.count(term)
            if tf:
                s += idf(term) * tf * (K1 + 1) / (
                    K1 * (1 - B + B * len(ts) / avgdl) + tf
                )
        if s:
            base[d] = s
    cand = sorted(base, key=lambda d: (-round(base[d], 6), d))[:depth]
    final = {}
    for d in cand:
        prox = 0.0
        terms = sorted(set(query_terms))
        for i, ta in enumerate(terms):
            for tb in terms[i + 1:]:
                tpi = sum(
                    1.0 / (pa - pb) ** 2
                    for pa, w in enumerate(toks[d]) if w == ta
                    for pb, w2 in enumerate(toks[d]) if w2 == tb
                    and abs(pa - pb) <= WINDOW
                )
                if tpi:
                    w = max(min(idf(ta), idf(tb)), 0.0)
                    prox += w * tpi * (K1 + 1) / (tpi + K1)
        final[d] = base[d] + prox
    return sorted(final.items(), key=lambda x: (-x[1], x[0]))


@pytest.fixture(scope="module")
def prox_index(spark, tmp_path_factory):
    rows = [("r", f"f{d}", "c0", "t", txt, d) for d, txt in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long"
    )
    out = str(tmp_path_factory.mktemp("prox") / "idx")
    return build_index(spark, corpus, out, log2_quantum=3,
                       positions=True, n_partitions=2)


def test_prox_rank_matches_mirror(spark, prox_index):
    got = [
        (int(r["docid"]), float(r["score"]))
        for r in run_queries_bm25_prox(
            prox_index, [{"qid": 1, "terms": ["alpha", "beta"]}],
            k=10, window=WINDOW,
        ).orderBy("rank").collect()
    ]
    want = _mirror(["alpha", "beta"])
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    assert np.allclose([s for _, s in got], [s for _, s in want], atol=1e-9)


def test_adjacent_beats_scattered(spark, prox_index):
    """doc1 (terms adjacent twice) must outrank doc2 (same tf pattern,
    pairs scattered to the window edge) after the proximity boost."""
    res = {int(r["docid"]): r["rank"]
           for r in run_queries_bm25_prox(
               prox_index, [{"qid": 1, "terms": ["alpha", "beta"]}],
               k=10, window=WINDOW).collect()}
    assert res[1] < res[2]


def test_single_term_query_is_plain_bm25(spark, prox_index):
    from terrier_ef_spark.query.engine import run_queries

    got = run_queries_bm25_prox(
        prox_index, [{"qid": 1, "terms": ["alpha"]}], k=5).collect()
    want = run_queries(
        prox_index, [{"qid": 1, "terms": ["alpha"]}],
        k=5, strategy="term_major").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
