"""BM25F fielded retrieval: exact scores vs a clean-room Python mirror,
the title-boost property, and the shared-docid-space guard."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.bm25f import run_queries_bm25f

CONTENT = {
    0: "beta beta gamma",
    1: "alpha alpha alpha beta delta delta",
    2: "beta gamma delta",
    3: "gamma gamma delta",
    4: "beta delta",
    5: "delta delta gamma beta",
}
TITLE = {
    0: "intro notes",
    1: "misc notes",
    2: "alpha alpha",
    3: "gamma",
    4: "other one",
    5: "more stuff",
}
W = {"content": 1.0, "title": 3.0}
K1, B = 1.2, 0.75


def _mirror(query_terms):
    """Independent BM25F computation straight from the published formula."""
    toks = {"content": {d: c.split() for d, c in CONTENT.items()},
            "title": {d: c.split() for d, c in TITLE.items()}}
    n = len(CONTENT)
    avgdl = {f: sum(len(t) for t in ts.values()) / n for f, ts in toks.items()}
    scores = {}
    for d in CONTENT:
        s = 0.0
        for term in query_terms:
            tfn = 0.0
            for f in toks:
                tf = toks[f][d].count(term)
                if tf:
                    dl = len(toks[f][d])
                    tfn += W[f] * tf / (1 + B * (dl / avgdl[f] - 1))
            if tfn:
                df = sum(
                    1 for dd in CONTENT
                    if any(term in toks[f][dd] for f in toks)
                )
                s += math.log2((n - df + 0.5) / (df + 0.5)) * tfn / (K1 + tfn)
        if s:
            scores[d] = s
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


@pytest.fixture(scope="module")
def field_indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bm25f")
    out = {}
    for name, texts in (("content", CONTENT), ("title", TITLE)):
        rows = [("r", f"f{d}", "c0", "t", txt, d)
                for d, txt in sorted(texts.items())]
        corpus = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string,"
            " content string, doc_id long"
        )
        out[name] = build_index(spark, corpus, str(root / name),
                                log2_quantum=3, n_partitions=2)
    return out


def test_bm25f_matches_mirror(spark, field_indexes):
    got = [
        (int(r["docid"]), float(r["score"]))
        for r in run_queries_bm25f(
            field_indexes, [{"qid": 1, "terms": ["alpha", "gamma"]}],
            k=10, weights=W,
        ).orderBy("rank").collect()
    ]
    want = _mirror(["alpha", "gamma"])
    assert [d for d, _ in got] == [d for d, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want], atol=1e-9)


def test_bm25f_title_match_beats_body_repetition(spark, field_indexes):
    """doc2 has 'alpha' ONLY in its 2-token title; doc1 has it 3x in a
    6-token body. The weighted short-field normalization must rank the
    title match higher — the property plain per-field BM25 sums miss."""
    res = {int(r["docid"]): r["rank"]
           for r in run_queries_bm25f(
               field_indexes, [{"qid": 1, "terms": ["alpha"]}],
               k=10, weights=W).collect()}
    assert res[2] < res[1]


def test_bm25f_guards(spark, field_indexes, tmp_path):
    corpus = spark.createDataFrame(
        [("r", "x", "c0", "t", "alpha beta", 0)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    other = build_index(spark, corpus, str(tmp_path / "one"), n_partitions=2)
    with pytest.raises(ValueError, match="same docid space"):
        run_queries_bm25f(
            {"content": field_indexes["content"], "title": other},
            [{"qid": 1, "terms": ["alpha"]}],
        )
    with pytest.raises(ValueError, match="at least one"):
        run_queries_bm25f({}, [{"qid": 1, "terms": ["alpha"]}])
