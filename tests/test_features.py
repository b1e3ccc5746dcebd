"""LTR feature extraction (query/features.py): each feature column
must equal the single-model scorer's score for the same (qid, docid)
— the features are the SAME Catalyst contribution expressions
(engine.model_contrib_expr), evaluated as sibling columns in one
pass, so any divergence means the shared expression drifted."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.features import run_queries_features

QUERIES = [
    {"qid": 1, "terms": ["import", "def"]},
    {"qid": 2, "terms": ["the", "val"]},
    {"qid": 3, "terms": ["zzz_absent_zzz", "import"]},
]
FEATURES = ("bm25", "lm_dirichlet", "pl2", "dph", "tf_idf",
            "inl2", "lgd", "dfree")


@pytest.fixture(scope="module")
def feat(small_index):
    return (
        run_queries_features(small_index, QUERIES, k=10, features=FEATURES)
        .orderBy("qid", "rank")
        .toPandas()
    )


@pytest.mark.parametrize("model", FEATURES)
def test_feature_equals_single_model_score(small_index, feat, model):
    want = (
        run_queries(small_index, [dict(q) for q in QUERIES], k=1000,
                    strategy="term_major", model=model)
        .select("qid", "docid", "score")
        .toPandas()
    )
    wmap = {(int(r.qid), int(r.docid)): float(r.score)
            for r in want.itertuples(index=False)}
    for r in feat.itertuples(index=False):
        assert wmap[(int(r.qid), int(r.docid))] == pytest.approx(
            float(getattr(r, f"f_{model}")), abs=1e-9
        ), (model, r.qid, r.docid)


def test_rank_is_bm25_rank(small_index, feat):
    want = (
        run_queries(small_index, [dict(q) for q in QUERIES], k=10,
                    strategy="term_major")
        .orderBy("qid", "rank")
        .toPandas()
    )
    # identical candidate cut and order (both rank on 6dp bm25, docid)
    got_pairs = [(int(r.qid), int(r.docid)) for r in feat.itertuples(index=False)]
    want_pairs = [(int(r.qid), int(r.docid)) for r in want.itertuples(index=False)]
    assert got_pairs == want_pairs


def test_doclen_and_nmatched(small_index, small_oracle, feat):
    for r in feat.itertuples(index=False):
        d = int(r.docid)
        assert int(r.doclen) == small_oracle.doclen[d]
        terms = next(q["terms"] for q in QUERIES if q["qid"] == int(r.qid))
        n = sum(
            1 for t in terms
            if any(dd == d for dd, _ in small_oracle.postings.get(t, []))
        )
        assert int(r.n_matched) == n


def test_qtf_weights_scale_features(small_index):
    plain = run_queries_features(
        small_index, [{"qid": 1, "terms": ["import"]}], k=5,
        features=("bm25", "pl2"),
    ).orderBy("rank").toPandas()
    boosted = run_queries_features(
        small_index,
        [{"qid": 1, "terms": ["import"], "weights": {"import": 3.0}}],
        k=5, features=("bm25", "pl2"),
    ).orderBy("rank").toPandas()
    assert list(plain["docid"]) == list(boosted["docid"])
    assert np.allclose(boosted["f_bm25"], 3.0 * plain["f_bm25"], atol=1e-9)
    assert np.allclose(boosted["f_pl2"], 3.0 * plain["f_pl2"], atol=1e-9)


def test_bad_args(small_index):
    with pytest.raises(ValueError, match="empty query batch"):
        run_queries_features(small_index, [])
    with pytest.raises(ValueError, match="rank_by"):
        run_queries_features(small_index, QUERIES, rank_by="nope")
    with pytest.raises(ValueError, match="empty term list"):
        run_queries_features(small_index, [{"qid": 1, "terms": []}])
