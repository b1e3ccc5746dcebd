"""Sequential Dependence Model (query/sdm.py) vs a brute-force pure-
Python mirror, plus the structural properties that pin each feature
family's contribution: adjacency beats scatter at equal unigram
evidence, single-term SDM reduces to the Dirichlet LM unigram model,
missing terms degrade gracefully, and lambda = (1, 0, 0) is exactly
the unigram-only model."""

from __future__ import annotations

import math

import numpy as np
import pytest

from terrier_ef_spark.query.sdm import run_queries_sdm

DOCS = {
    # 0: adjacent bigram "alpha beta" twice + window co-occurrence
    0: "alpha beta gamma delta alpha beta",
    # 1: both terms present, reversed/scattered (no ordered bigram,
    #    still inside the window-8 span)
    1: "beta alpha zeta zeta alpha gamma gamma beta",
    # 2: both terms present but > 8 positions apart (no U match)
    2: "alpha zeta zeta zeta zeta zeta zeta zeta zeta beta",
    3: "gamma delta epsilon",
    4: "alpha beta alpha beta alpha",
    5: "delta epsilon zeta eta",
}
MU = 2500.0
LAMBDAS = (0.85, 0.10, 0.05)
WINDOW = 8


@pytest.fixture(scope="module")
def sdm_index(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [
        ("r", f"f{d}.txt", "c0ffee", "text", content, d)
        for d, content in sorted(DOCS.items())
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long"
    )
    out = str(tmp_path_factory.mktemp("sdm") / "idx")
    return build_index(spark, corpus, out, log2_quantum=3, n_partitions=2,
                       positions=True)


# ---- brute-force mirror (independent of the Spark relational shape) --

_TOKS = {d: s.split() for d, s in DOCS.items()}
_C = sum(len(t) for t in _TOKS.values())


def _cf(t):
    return sum(tk.count(t) for tk in _TOKS.values())


def _o_count(a, b, tk):
    return sum(1 for i in range(len(tk) - 1) if tk[i] == a and tk[i + 1] == b)


def _u_count(a, b, tk, w=WINDOW):
    n = 0
    for i, t in enumerate(tk):
        if t in (a, b):
            span = set(tk[i : i + w + 1])
            if a in span and b in span:
                n += 1
    return n


def _contrib(count, cf, dl, mu=MU):
    return math.log2(1 + count / (mu * cf / _C)) + math.log2(mu / (dl + mu))


def _mirror(terms, lambdas=LAMBDAS, window=WINDOW):
    lam_t, lam_o, lam_u = lambdas
    pairs = list(zip(terms, terms[1:]))
    cfo = {p: sum(_o_count(*p, tk) for tk in _TOKS.values()) for p in pairs}
    cfu = {
        p: sum(_u_count(*p, tk, window) for tk in _TOKS.values())
        for p in pairs
    }
    out = {}
    for d, tk in _TOKS.items():
        s, matched = 0.0, False
        for t in set(terms):
            c = tk.count(t)
            if c:
                s += lam_t * terms.count(t) * _contrib(c, _cf(t), len(tk))
                matched = True
        for p in pairs:
            co = _o_count(*p, tk)
            if co and cfo[p]:
                s += lam_o * _contrib(co, cfo[p], len(tk))
                matched = True
            cu = _u_count(*p, tk, window)
            if cu and cfu[p]:
                s += lam_u * _contrib(cu, cfu[p], len(tk))
                matched = True
        if matched:
            out[d] = s
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))


def _got(index, queries, **kw):
    pdf = (
        run_queries_sdm(index, queries, k=10, **kw)
        .orderBy("qid", "rank")
        .toPandas()
    )
    out = {}
    for r in pdf.itertuples(index=False):
        out.setdefault(int(r.qid), []).append((int(r.docid), float(r.score)))
    return out


def _assert_same(got, want):
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    assert np.allclose([s for _, s in got], [s for _, s in want], atol=1e-9)


def test_sdm_matches_mirror_batch(sdm_index):
    queries = [
        {"qid": 1, "terms": ["alpha", "beta"]},
        {"qid": 2, "terms": ["gamma"]},
        {"qid": 3, "terms": ["alpha", "gamma", "delta"]},
    ]
    got = _got(sdm_index, queries)
    for q in queries:
        _assert_same(got[q["qid"]], _mirror(q["terms"]))


def test_sdm_batch_equals_solo(sdm_index):
    """A topic scores identically whether batched or solo — feature
    collection statistics are per-feature, not per-batch."""
    batch = _got(
        sdm_index,
        [{"qid": 1, "terms": ["alpha", "beta"]},
         {"qid": 2, "terms": ["gamma", "delta"]}],
    )
    solo = _got(sdm_index, [{"qid": 2, "terms": ["gamma", "delta"]}])
    _assert_same(batch[2], solo[2])


def test_adjacency_beats_scatter(sdm_index):
    """Docs 0 (adjacent 'alpha beta') and 1 (scattered, window-only)
    and 2 (outside the window) are strictly ordered by the dependence
    features when the unigram playing field is leveled by a custom
    lambda that zeroes the T part."""
    got = _got(sdm_index, [{"qid": 1, "terms": ["alpha", "beta"]}],
               lambdas=(0.0, 0.10, 0.05))
    score = dict(got[1])
    # ordered-bigram docs (0, 4) come first, window-only doc 1 next;
    # doc 2 (span > 8) stays in the matched set (it matched the
    # zero-weighted unigrams) but earns NO dependence evidence
    docs = [d for d, _ in got[1]]
    assert set(docs[:2]) == {0, 4}
    assert min(score[0], score[4]) > score[1] > 0.0
    assert score[2] == 0.0


def test_single_term_reduces_to_dirichlet(sdm_index):
    """With no bigrams, SDM is exactly lambda_T x the engine's
    lm_dirichlet ranking (same matched-term decomposition)."""
    from terrier_ef_spark.query.engine import run_queries

    got = _got(sdm_index, [{"qid": 1, "terms": ["alpha"]}])
    lm = (
        run_queries(sdm_index, [{"qid": 1, "terms": ["alpha"]}], k=10,
                    strategy="term_major", model="lm_dirichlet")
        .orderBy("rank")
        .toPandas()
    )
    want = [(int(r.docid), LAMBDAS[0] * float(r.score))
            for r in lm.itertuples(index=False)]
    _assert_same(got[1], want)


def test_missing_term_drops_features(sdm_index):
    """A term absent from the lexicon contributes no unigram and kills
    its bigrams' counts, but the query still ranks on what remains."""
    got = _got(sdm_index, [{"qid": 1, "terms": ["alpha", "zzzmissing"]}])
    want = [
        (d, LAMBDAS[0] * _contrib(tk.count("alpha"), _cf("alpha"), len(tk)))
        for d, tk in _TOKS.items()
        if tk.count("alpha")
    ]
    want.sort(key=lambda x: (-x[1], x[0]))
    _assert_same(got[1], want)


def test_adjacent_repeat_rejected(sdm_index):
    with pytest.raises(ValueError, match="adjacent repeated term"):
        run_queries_sdm(sdm_index, [{"qid": 1, "terms": ["alpha", "alpha"]}])


def test_qtf_weighting(sdm_index):
    """A non-adjacent repeated unigram doubles its T weight (qtf), and
    both orderings of the repeated pair become features."""
    got = _got(sdm_index, [{"qid": 1, "terms": ["alpha", "beta", "alpha"]}])
    _assert_same(got[1], _mirror(["alpha", "beta", "alpha"]))


def test_selective_positions_identity(sdm_index):
    """Forced candidate-selective positions decode (hot-term path) is
    score-identical to forced whole-list decode and to the auto
    policy, batch included."""
    queries = [
        {"qid": 1, "terms": ["alpha", "beta"]},
        {"qid": 3, "terms": ["alpha", "gamma", "delta"]},
    ]
    full = _got(sdm_index, queries, selective=False)
    sel = _got(sdm_index, queries, selective=True)
    auto = _got(sdm_index, queries)
    for qid in (1, 3):
        _assert_same(sel[qid], full[qid])
        _assert_same(auto[qid], full[qid])
