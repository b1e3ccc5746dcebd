"""Static document priors (engine.run_queries(prior=...)): additive
ln-prior on the folded scores before ranking — Kraaij, Westerveld &
Hiemstra SIGIR'02 web priors / Terrier's document-prior feature."""

from __future__ import annotations

import math

import pytest

from terrier_ef_spark.query.engine import run_queries

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
}

QUERIES = [
    {"qid": 1, "terms": ["spark", "table"]},
    {"qid": 2, "terms": ["common", "value"]},
]


@pytest.fixture(scope="module")
def prior_idx(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("prior") / "idx"),
        log2_quantum=3, n_partitions=2,
    )


def _res(df):
    return [
        (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
        for r in df.orderBy("qid", "rank").collect()
    ]


def test_neutral_prior_is_identity(prior_idx, spark):
    ones = spark.createDataFrame(
        [(d, 1.0) for d in DOCS], "docid long, prior double"
    )
    base = _res(run_queries(prior_idx, QUERIES, k=5, strategy="term_major"))
    got = _res(
        run_queries(prior_idx, QUERIES, k=5, strategy="term_major",
                    prior=ones)
    )
    assert got == base


def test_scores_shift_by_weighted_log_prior(prior_idx, spark):
    priors = {0: 0.5, 1: 2.0, 2: 1.0, 3: 4.0, 4: 0.25}
    pf = spark.createDataFrame(
        list(priors.items()), "docid long, prior double"
    )
    w = 0.7
    base = {
        (r["qid"], r["docid"]): r["score"]
        for r in run_queries(
            prior_idx, QUERIES, k=5, strategy="term_major"
        ).collect()
    }
    got = run_queries(
        prior_idx, QUERIES, k=5, strategy="term_major",
        prior=pf, prior_weight=w,
    ).collect()
    assert len(got) == len(base)
    for r in got:
        want = base[(r["qid"], r["docid"])] + w * math.log(priors[r["docid"]])
        assert abs(r["score"] - want) < 1e-9


def test_prior_promotes_from_any_rank(prior_idx, spark):
    """A strong prior lifts a doc to rank 1 even if it was LAST in the
    base ranking — the prior applies to the full matched set, not a
    top-k page."""
    base = run_queries(
        prior_idx, [QUERIES[0]], k=5, strategy="term_major"
    ).collect()
    last = max(base, key=lambda r: r["rank"])["docid"]
    boost = spark.createDataFrame(
        [(int(last), 1e6)], "docid long, prior double"
    )
    got = run_queries(
        prior_idx, [QUERIES[0]], k=5, strategy="term_major", prior=boost
    ).collect()
    assert next(r["docid"] for r in got if r["rank"] == 1) == last


def test_missing_docids_take_neutral_prior(prior_idx, spark):
    partial = spark.createDataFrame(
        [(0, 1.0)], "docid long, prior double"
    )
    base = _res(run_queries(prior_idx, QUERIES, k=5, strategy="term_major"))
    got = _res(
        run_queries(prior_idx, QUERIES, k=5, strategy="term_major",
                    prior=partial)
    )
    assert got == base


def test_prior_guards(prior_idx, spark):
    pf = spark.createDataFrame([(0, 1.0)], "docid long, prior double")
    with pytest.raises(ValueError, match="prior runs on the exhaustive"):
        run_queries(prior_idx, QUERIES, algo="bmw", prior=pf)
    with pytest.raises(ValueError, match="term-major only"):
        run_queries(prior_idx, QUERIES, strategy="query_major", prior=pf)


def test_duplicate_prior_rows_tolerated(prior_idx, spark):
    """Duplicate docid rows in the prior relation fold (max) instead
    of fanning out the scored rows into duplicate results."""
    dup = spark.createDataFrame(
        [(0, 2.0), (0, 2.0), (1, 3.0)], "docid long, prior double"
    )
    single = spark.createDataFrame(
        [(0, 2.0), (1, 3.0)], "docid long, prior double"
    )
    a = _res(run_queries(prior_idx, QUERIES, k=5, strategy="term_major",
                         prior=dup))
    b = _res(run_queries(prior_idx, QUERIES, k=5, strategy="term_major",
                         prior=single))
    assert a == b
    docids = [(q, d) for q, _, d, _ in a]
    assert len(set(docids)) == len(docids)


def test_nonpositive_prior_raises(prior_idx, spark):
    bad = spark.createDataFrame([(0, 0.0)], "docid long, prior double")
    with pytest.raises(Exception, match="must be > 0"):
        run_queries(prior_idx, QUERIES, k=5, strategy="term_major",
                    prior=bad).collect()
