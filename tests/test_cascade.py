"""Two-stage cascade retrieval (query/cascade.py): impact-tier first
pass -> exact BM25 re-rank of the bounded candidate pool. Covers
full-depth equivalence to exhaustive exact retrieval, the depth
truncation semantics, decode-policy identity, tombstone honoring,
and guards."""

from __future__ import annotations

import pytest

from terrier_ef_spark.index.impact import build_impact_index, run_queries_impact
from terrier_ef_spark.query.cascade import run_queries_cascade
from terrier_ef_spark.query.engine import run_queries

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
    5: "merge merge table value",
    6: "cable value common common",
}

QUERIES = [
    {"qid": 1, "terms": ["spark", "table"]},
    {"qid": 2, "terms": ["merge"]},
    {"qid": 3, "terms": ["common", "value", "zzzmissing"]},
]


def _build(spark, root):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus, str(root / "idx"), log2_quantum=3, n_partitions=2
    )


@pytest.fixture(scope="module")
def cascade_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cascade")
    idx = _build(spark, root)
    imp = build_impact_index(idx, str(root / "imp"), bits=8)
    return idx, imp


def _rows(df):
    return [
        (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
        for r in df.orderBy("qid", "rank").collect()
    ]


def test_full_depth_matches_exact(cascade_setup):
    """With depth >= the whole match set, the cascade is rank- and
    score-identical to the exhaustive exact scorer: the candidate cut
    removes nothing, and stage 2 computes the same global-statistics
    contributions."""
    idx, imp = cascade_setup
    got = _rows(run_queries_cascade(imp, idx, QUERIES, k=5, depth=len(DOCS)))
    want = _rows(
        run_queries(idx, QUERIES, k=5, strategy="term_major")
    )
    assert got == want


def test_depth_one_returns_impact_winner_with_exact_score(cascade_setup):
    """depth=1: the only candidate is the tier's integer-score winner;
    its reported score is the exact BM25 score, not the impact sum."""
    idx, imp = cascade_setup
    winners = {
        r["qid"]: r["docid"]
        for r in run_queries_impact(imp, QUERIES, k=1).collect()
    }
    exact = {
        (r["qid"], r["docid"]): round(r["score"], 6)
        for r in run_queries(
            idx, QUERIES, k=len(DOCS), strategy="term_major"
        ).collect()
    }
    got = _rows(run_queries_cascade(imp, idx, QUERIES, k=1, depth=1))
    assert [(q, r, d) for q, r, d, _ in got] == [
        (q, 1, winners[q]) for q in sorted(winners)
    ]
    for q, _, d, s in got:
        assert s == exact[(q, d)]


def test_candidates_bound_results(cascade_setup):
    """Every cascade result lies inside the tier's top-`depth` pool —
    the depth cut is a hard candidate restriction, not a hint."""
    idx, imp = cascade_setup
    depth = 2
    pool = {
        (r["qid"], r["docid"])
        for r in run_queries_impact(imp, QUERIES, k=depth).collect()
    }
    got = run_queries_cascade(imp, idx, QUERIES, k=2, depth=depth).collect()
    assert got and all((r["qid"], r["docid"]) in pool for r in got)


def test_selective_policy_identity(cascade_setup):
    """Forced candidate-selective decode, forced whole-list decode,
    and the auto cutover return identical results."""
    idx, imp = cascade_setup
    want = _rows(
        run_queries_cascade(imp, idx, QUERIES, k=4, depth=4, selective=False)
    )
    assert want == _rows(
        run_queries_cascade(imp, idx, QUERIES, k=4, depth=4, selective=True)
    )
    assert want == _rows(
        run_queries_cascade(imp, idx, QUERIES, k=4, depth=4)
    )


def test_tombstones_drop_candidates(spark, tmp_path):
    """Deleting a doc AFTER the tier was derived: the stale tier still
    surfaces it, but the cascade honors the exact index's tombstones —
    the doc never appears, and the pool is not backfilled."""
    from terrier_ef_spark.index.maintenance import delete_docs

    idx = _build(spark, tmp_path)
    imp = build_impact_index(idx, str(tmp_path / "imp"), bits=8)
    q = [{"qid": 1, "terms": ["merge"]}]
    top = run_queries_cascade(imp, idx, q, k=3, depth=3).collect()
    victim = next(r["docid"] for r in top if r["rank"] == 1)
    delete_docs(idx, [int(victim)])
    after = run_queries_cascade(imp, idx, q, k=3, depth=3).collect()
    assert victim not in {r["docid"] for r in after}
    assert {r["docid"] for r in after} == {
        r["docid"] for r in top if r["docid"] != victim
    }


def test_guards(cascade_setup, spark, tmp_path):
    idx, imp = cascade_setup
    with pytest.raises(ValueError, match="k must be"):
        run_queries_cascade(imp, idx, QUERIES, k=0)
    with pytest.raises(ValueError, match="depth must be"):
        run_queries_cascade(imp, idx, QUERIES, k=10, depth=5)
    with pytest.raises(ValueError, match="no query terms"):
        run_queries_cascade(imp, idx, [], k=1, depth=1)
    # a tier derived from a DIFFERENT index is refused up front
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", DOCS[d], d) for d in (0, 1, 2)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    other = build_index(
        spark, corpus, str(tmp_path / "other"), log2_quantum=3,
        n_partitions=2,
    )
    imp2 = build_impact_index(other, str(tmp_path / "other_imp"), bits=8)
    with pytest.raises(ValueError, match="does not derive"):
        run_queries_cascade(imp2, idx, QUERIES, k=1, depth=1)


def test_cascade_inherits_build_params(spark, tmp_path):
    """A k1/b-tuned build cascades consistently: stage 2 defaults to
    the stats-recorded parameters (which also quantized the tier), so
    full-depth cascade == exhaustive exact on the tuned index."""
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "tuned"), log2_quantum=3,
        n_partitions=2, k1=2.0, b=0.3,
    )
    imp = build_impact_index(idx, str(tmp_path / "tuned_imp"), bits=8)
    got = _rows(run_queries_cascade(imp, idx, QUERIES, k=5, depth=len(DOCS)))
    want = _rows(run_queries(idx, QUERIES, k=5, strategy="term_major"))
    assert got == want
    # and it differs from the default-parameter scoring (the tune bites)
    default_scores = _rows(
        run_queries(idx, QUERIES, k=5, strategy="term_major",
                    k1=1.2, b=0.75)
    )
    assert got != default_scores
