"""Pinned-constants weighting-model fixture (VERDICT r02 Wrong #5 /
Next #7): the DuckDB oracle twins prove Spark==SQL consistency but
share each model's formula with the engine by construction. This test
pins LITERAL expected scores for a 10-doc corpus, computed once by a
standalone clean-room script written only from the published formulas
(Robertson/Sparck-Jones BM25 as parameterized in Terrier 5's BM25
model; Amati's DFR DPH and PL2; Zhai & Lafferty Dirichlet LM; Hiemstra
JM LM) with the engine's documented constants k1=1.2, b=0.75, c=1.0,
mu=2500, jm c=0.15, log base 2. If any constant or formula term in the engine drifts, these
literals break even if the SQL twin drifts with it.

The intended closure — running terrier-core 5.x itself once and
pinning ITS output — is infeasible in this container (no network, no
maven, no terrier jars); documented in COVERAGE.md. These literals are
the strongest available substitute: a third, independently-authored
expression of each formula, frozen.

Derivation (the generator script, kept runnable by hand):
    docs = {0: "alpha alpha alpha beta gamma", 1: "alpha beta beta delta",
            2: "beta gamma gamma gamma delta delta", 3: "alpha delta",
            4: "epsilon epsilon beta gamma gamma epsilon zeta",
            5: "beta delta delta zeta", 6: "delta beta zeta eta",
            7: "epsilon beta eta", 8: "zeta eta delta epsilon",
            9: "eta zeta zeta beta delta eta"}
    N=10, num_tokens=45, avgdl=4.5; query = [alpha, gamma] (df 3 each,
    idf = log2(7.5/3.5) = 1.0995356735509143); per-model scores below.
"""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark.query.engine import run_queries

DOCS = {
    0: "alpha alpha alpha beta gamma",
    1: "alpha beta beta delta",
    2: "beta gamma gamma gamma delta delta",
    3: "alpha delta",
    4: "epsilon epsilon beta gamma gamma epsilon zeta",
    5: "beta delta delta zeta",
    6: "delta beta zeta eta",
    7: "epsilon beta eta",
    8: "zeta eta delta epsilon",
    9: "eta zeta zeta beta delta eta",
}

QUERY = ["alpha", "gamma"]

# (docid, score) in engine tie-break order (score desc, docid asc),
# pinned from the clean-room generator in the module docstring
PINNED = {
    "bm25": [
        (0, 2.739389180616232),
        (2, 1.6126523212080077),
        (3, 1.4229285187129483),
        (4, 1.3075559361146007),
        (1, 1.151894515148577),
    ],
    "dph": [
        (0, 0.9101646253436182),
        (1, 0.6435434015266077),
        (4, 0.6432153058253176),
        (2, 0.45868131887014335),
        (3, 0.374459133272309),
    ],
    "pl2": [
        (0, 2.211643099116901),
        (2, 1.2306287040225028),
        (3, 1.10339564898644),
        (4, 0.8971850987771991),
        (1, 0.8420319345435844),
    ],
    "lm_dirichlet": [
        (0, 0.014054158279176183),
        (2, 0.009467854671858877),
        (4, 0.00459640385895015),
        (3, 0.0040306812433529154),
        (1, 0.002877908476554365),
    ],
    # Hiemstra JM LM, c=0.15: log2(1 + (c*tf*ntok)/((1-c)*cf*dl));
    # cf(alpha)=5, cf(gamma)=6, ntok=45
    "lm_jm": [
        (0, 1.3044504086609812),
        (3, 0.8432744963125467),
        (2, 0.7327161211648482),
        (1, 0.48239276708060835),
        (4, 0.4627342413101402),
    ],
    # Robertson tf x Sparck-Jones idf (Terrier TF_IDF; k1=1.2, b=0.75):
    # Rtf = k1*tf/(tf + k1*(1-b+b*dl/avgdl)), idf = log2(1 + N/df)
    "tf_idf": [
        (0, 2.8748244491530777),
        (2, 1.6923817739359488),
        (3, 1.4932780358258373),
        (4, 1.372201438326445),
        (1, 1.2088441242399637),
    ],
    # DFR InL2 (c=1): tfn = tf*log2(1+avgdl/dl),
    # contrib = tfn/(tfn+1) * log2((N+1)/(df+0.5))
    "inl2": [
        (0, 2.0090881728794425),
        (2, 1.169304800234975),
        (3, 1.0402960723053114),
        (4, 0.9728844824272397),
        (1, 0.860648622300709),
    ],
    # DFR DLH13: (tf*log2(tf*(avgdl/dl)*(N/cf))
    #             + 0.5*log2(2*pi*tf*(1-tf/dl))) / (tf+0.5)
    "dlh13": [
        (0, 3.6682529613847206),
        (2, 2.0968288862635123),
        (3, 1.9971153774523145),
        (1, 1.525436211026033),
        (4, 1.5128423993011473),
    ],
    # DFR IFB2 (Amati & van Rijsbergen TOIS'02; Bernoulli norm 2, c=1):
    # tfn = tf*log2(1+avgdl/dl), B = (cf+1)/(df*(tfn+1)),
    # contrib = B * tfn * log2((N+1)/(cf+0.5))
    "ifb2": [
        (0, 2.3220874408946304),
        (3, 1.2593798755942072),
        (2, 1.2534628125900444),
        (4, 1.0429055960630629),
        (1, 1.0418991128953228),
    ],
    # DFR In_expB2: n_exp = N*(1-((N-1)/N)^cf),
    # contrib = B * tfn * log2((N+1)/(n_exp+0.5))
    "in_expb2": [
        (0, 3.069114419895533),
        (2, 1.7917335211563918),
        (3, 1.585981609514095),
        (4, 1.4907573620047407),
        (1, 1.312100394840256),
    ],
    # DFR BB2 (Bose-Einstein via Stirling):
    # contrib = B * (-log2(N-1) - log2(e)
    #                + stirling(N+cf-1, N+cf-tfn-2) - stirling(cf, cf-tfn)),
    # stirling(a, b) = (b+0.5)*log2(a/b) + (a-b)*log2(a)
    "bb2": [
        (0, 4.902935231441474),
        (2, 2.7047115582410775),
        (4, 2.4261141254760723),
        (3, 2.288623783541206),
        (1, 2.0505981073081507),
    ],
    # Log-logistic LGD (Clinchant & Gaussier SIGIR'10): lam = df/N,
    # contrib = log2((lam + tfn)/lam)
    "lgd": [
        (0, 5.389881897224344),
        (2, 3.1816669875050794),
        (3, 2.737282748893583),
        (4, 2.529749387078993),
        (1, 2.209414728179059),
    ],
    # DFRee (Amati, parameter-free): prior = tf/dl, post = (tf+1)/(dl+1),
    # invC = ntok/cf, norm = tf*log2(post/prior),
    # contrib = norm*(tf*(-log2(prior*invC)) + (tf+1)*log2(post*invC)
    #                 + 0.5*log2(post/prior))
    "dfree": [
        (0, 3.210261718395073),
        (1, 1.942747045824599),
        (4, 1.9401247249119864),
        (2, 1.6030729640042034),
        (3, 1.3312405607403495),
    ],
}


@pytest.fixture(scope="module")
def pinned_index(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [
        ("r", f"f{d}.txt", "deadbeefcafe", "text", content, d)
        for d, content in sorted(DOCS.items())
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long"
    )
    out = str(tmp_path_factory.mktemp("pinned") / "idx")
    return build_index(spark, corpus, out, log2_quantum=3, n_partitions=2)


def _got(index, **kw):
    pdf = (
        run_queries(index, [{"qid": 1, "terms": QUERY}], k=10, **kw)
        .orderBy("rank")
        .toPandas()
    )
    return [(int(r.docid), float(r.score)) for r in pdf.itertuples(index=False)]


@pytest.mark.parametrize("model", ["bm25", "dph", "pl2", "lm_dirichlet",
                                   "lm_jm", "tf_idf", "inl2", "dlh13",
                                   "ifb2", "in_expb2", "bb2", "lgd",
                                   "dfree"])
def test_pinned_scores_term_major(pinned_index, model):
    got = _got(pinned_index, strategy="term_major", model=model)
    want = PINNED[model]
    assert [d for d, _ in got] == [d for d, _ in want], (model, got)
    assert np.allclose(
        [s for _, s in got], [s for _, s in want], atol=1e-9
    ), (model, got)


@pytest.mark.parametrize("algo", ["naive", "bmw", "maxscore"])
def test_pinned_scores_query_major_kernel(pinned_index, algo):
    got = _got(pinned_index, strategy="query_major", algo=algo)
    want = PINNED["bm25"]
    assert [d for d, _ in got] == [d for d, _ in want], (algo, got)
    assert np.allclose(
        [s for _, s in got], [s for _, s in want], atol=1e-9
    ), (algo, got)
