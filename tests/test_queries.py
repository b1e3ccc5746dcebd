"""Top-k BM25 rank-identity tests: engine (naive + BMW + conjunctive)
vs the plain-Python oracle (FIXTURES.md F4): rank-identical docids,
scores equal to 1e-9, BMW pruning on and off."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark.query.engine import run_queries

# query set: high-df head tokens, low-df tail, absent terms, mixed
QUERIES = [
    {"qid": 1, "terms": ["the"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["v150", "v73"], "mode": "disjunctive"},
    {"qid": 4, "terms": ["the", "v999"], "mode": "disjunctive"},
    {"qid": 5, "terms": ["zzz_absent_zzz"], "mode": "disjunctive"},
    {"qid": 6, "terms": ["the", "import", "class", "return", "v9"], "mode": "disjunctive"},
    {"qid": 7, "terms": ["import", "def"], "mode": "conjunctive"},
    {"qid": 8, "terms": ["the", "v150"], "mode": "conjunctive"},
    {"qid": 9, "terms": ["the", "zzz_absent_zzz"], "mode": "conjunctive"},
    {"qid": 10, "terms": ["v30", "v31", "v32"], "mode": "conjunctive"},
]


def _engine_results(index, algo, k=10):
    pdf = (
        run_queries(index, QUERIES, k=k, algo=algo)
        .orderBy("qid", "rank")
        .toPandas()
    )
    out = {q["qid"]: [] for q in QUERIES}
    for r in pdf.itertuples(index=False):
        out[int(r.qid)].append((int(r.docid), float(r.score)))
    return out


def _oracle_results(oracle, k=10):
    return {
        q["qid"]: oracle.bm25_topk(q["terms"], k=k, mode=q["mode"])
        for q in QUERIES
    }


@pytest.mark.parametrize("algo", ["naive", "bmw", "maxscore"])
def test_rank_identity_vs_oracle(small_index, small_oracle, algo):
    got = _engine_results(small_index, algo)
    want = _oracle_results(small_oracle)
    for q in QUERIES:
        qid = q["qid"]
        g, w = got[qid], want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, algo, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


def test_term_major_rank_identity_vs_oracle(small_index, small_oracle):
    """The relational (term-major) scorer is rank-identical to the
    Python oracle on the same mixed query set."""
    pdf = (
        run_queries(small_index, QUERIES, k=10, strategy="term_major")
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {q["qid"]: [] for q in QUERIES}
    for r in pdf.itertuples(index=False):
        got[int(r.qid)].append((int(r.docid), float(r.score)))
    want = _oracle_results(small_oracle)
    for q in QUERIES:
        qid = q["qid"]
        g, w = got[qid], want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


def test_term_major_no_doclen_broadcast(small_index, monkeypatch):
    """The term-major path must never materialize the dense doclen array
    on the driver (the r01 scale-killer): doclen_array is poisoned, and
    relational auto-broadcast is disabled so the doclen join runs as a
    genuine partitioned join — the 10^9-doc plan shape."""
    from terrier_ef_spark.index.reader import EFIndex

    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("dense doclen broadcast used in term_major path")

    monkeypatch.setattr(EFIndex, "doclen_array", boom)
    monkeypatch.setattr(EFIndex, "doclen_broadcast", boom)
    spark = small_index.spark
    # conf.get(key, None) is None when the threshold was never set
    # explicitly — restore must then UNSET, not skip: leaving -1 in
    # the session-scoped SparkSession turns every later plan-shape
    # test's broadcasts into sort-merge joins (observed as an
    # order-dependent test_substring plan failure)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = run_queries(
            small_index, QUERIES[:4], k=10, strategy="term_major"
        ).collect()
        assert len(out) > 0
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # and the query-major kernel path refuses nothing but uses it:
    with pytest.raises(Exception):
        run_queries(small_index, QUERIES[:1], strategy="query_major").collect()


def test_bmw_term_major_rank_identity(small_index, small_oracle, monkeypatch):
    """The fully relational BMW (algo='bmw', strategy='term_major' — no
    doclen broadcast, no per-query kernel) is rank-identical to the
    oracle on the mixed query set, with the pruning machinery FORCED on
    (the min-postings gate would otherwise fall back to exhaustive on
    this small corpus). The set includes 'the' (df ~ N, negative idf)
    so the ub>=0 clamp's safe-to-k argument is exercised."""
    import terrier_ef_spark.query.engine as eng

    monkeypatch.setattr(eng, "BMW_TERM_MAJOR_MIN_POSTINGS", 0)
    pdf = (
        run_queries(small_index, QUERIES, k=10, algo="bmw", strategy="term_major")
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {q["qid"]: [] for q in QUERIES}
    for r in pdf.itertuples(index=False):
        got[int(r.qid)].append((int(r.docid), float(r.score)))
    want = _oracle_results(small_oracle)
    for q in QUERIES:
        qid = q["qid"]
        g, w = got[qid], want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


@pytest.mark.parametrize("model", ["dph", "pl2", "lm_dirichlet"])
def test_weighting_model_rank_identity_vs_oracle(small_index, small_oracle, model):
    """Pluggable weighting models (DPH after Amati, Dirichlet LM after
    Zhai & Lafferty — Terrier's WeightingModel plug-in role) are
    rank-identical to the plain-Python oracle on the mixed query set."""
    pdf = (
        run_queries(small_index, QUERIES, k=10, model=model)
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {q["qid"]: [] for q in QUERIES}
    for r in pdf.itertuples(index=False):
        got[int(r.qid)].append((int(r.docid), float(r.score)))
    for q in QUERIES:
        qid = q["qid"]
        w = small_oracle.bm25_topk(q["terms"], k=10, mode=q["mode"], model=model)
        g = got[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, model, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


def test_weighting_model_rejects_bmw():
    """BMW's metadata bounds are BM25-specific; other models must refuse
    rather than silently mis-prune."""
    with pytest.raises(ValueError):
        run_queries(None, [], algo="bmw", model="dph")
    with pytest.raises(ValueError):
        run_queries(None, [], algo="maxscore", model="pl2")
    with pytest.raises(ValueError):
        run_queries(None, [{"qid": 1, "terms": ["x"]}], model="nonesuch")
    with pytest.raises(ValueError):
        run_queries(None, [{"qid": 1, "terms": ["x"]}], algo="nonesuch")


def test_bmw_equals_naive_everywhere(small_index):
    assert _engine_results(small_index, "naive") == pytest.approx(
        _engine_results(small_index, "bmw")
    ) or _engine_results(small_index, "naive") == _engine_results(small_index, "bmw")


def test_query_term_weights(small_index, small_oracle):
    """Terrier's term^w weights scale contributions linearly — verified
    against a direct recomputation, on BOTH strategies, and an invalid
    weight is rejected."""
    q = [{"qid": 1, "terms": ["the", "import"], "weights": {"import": 3.0}}]

    def expected():
        import heapq

        scores = {}
        for t, w in (("the", 1.0), ("import", 3.0)):
            for d, tf in small_oracle.postings[t]:
                dl = small_oracle.doclen[d]
                tfn = tf * 2.2 / (1.2 * (0.25 + 0.75 * dl / small_oracle.avgdl) + tf)
                scores[d] = scores.get(d, 0.0) + w * small_oracle.idf(t) * tfn
        return heapq.nsmallest(10, scores.items(), key=lambda kv: (-kv[1], kv[0]))

    want = expected()
    for strategy in ("term_major", "query_major"):
        got = (
            run_queries(small_index, q, k=10, strategy=strategy)
            .orderBy("rank").collect()
        )
        assert [r["docid"] for r in got] == [d for d, _ in want], strategy
        assert np.allclose(
            [r["score"] for r in got], [s for _, s in want], atol=1e-9
        ), strategy
    with pytest.raises(ValueError):
        run_queries(
            small_index,
            [{"qid": 1, "terms": ["the"], "weights": {"the": -1.0}}],
            strategy="term_major",
        )


def test_with_docno(small_index):
    from terrier_ef_spark.query.engine import with_docno

    res = run_queries(
        small_index, [{"qid": 1, "terms": ["the"]}], k=5, strategy="query_major"
    )
    out = with_docno(small_index, res).orderBy("rank").collect()
    assert len(out) == 5
    assert all(r["docno"] and ":" in r["docno"] for r in out)


def test_kernel_rank_identity_randomized(small_oracle):
    """Kernel-level (no Spark) property check over random query mixes:
    BMW == naive == oracle on 30 random queries."""
    import random

    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.bm25 import TermPostings

    rng = random.Random(42)
    vocab = sorted(small_oracle.postings)
    doclen_arr = np.array(
        [small_oracle.doclen[d] for d in range(small_oracle.num_docs)],
        dtype=np.int32,
    )
    q = 8  # quantum for block metadata

    def term_postings(t):
        plist = small_oracle.postings[t]
        docids = np.array([d for d, _ in plist], dtype=np.int64)
        tfs = np.array([tf for _, tf in plist], dtype=np.int64)
        dls = doclen_arr[docids].astype(np.int64)
        n_q = (len(docids) + q - 1) // q
        q_last = docids[np.minimum(np.arange(1, n_q + 1) * q - 1, len(docids) - 1)]
        pad_tf = np.zeros(n_q * q, dtype=np.int64)
        pad_tf[: len(docids)] = tfs
        pad_dl = np.full(n_q * q, np.iinfo(np.int64).max, dtype=np.int64)
        pad_dl[: len(docids)] = dls
        return TermPostings(
            term=t,
            idf=small_oracle.idf(t),
            docids=docids,
            tfs=tfs,
            q_last_docid=q_last,
            q_max_tf=pad_tf.reshape(n_q, q).max(axis=1),
            q_min_dl=pad_dl.reshape(n_q, q).min(axis=1),
        )

    for _ in range(30):
        terms = rng.sample(vocab[:200], rng.randint(1, 5))
        tps = [term_postings(t) for t in terms]
        d1, s1 = bm25.topk_disjunctive(tps, doclen_arr, small_oracle.avgdl, 10)
        d2, s2 = bm25.topk_bmw(tps, doclen_arr, small_oracle.avgdl, 10)
        d3, s3 = bm25.topk_maxscore(tps, doclen_arr, small_oracle.avgdl, 10)
        want = small_oracle.bm25_topk(terms, k=10)
        assert d1.tolist() == [d for d, _ in want]
        assert d2.tolist() == d1.tolist()
        assert d3.tolist() == d1.tolist()
        assert np.allclose(s1, [s for _, s in want], atol=1e-9)
        assert np.allclose(s2, s1, atol=0)
        assert np.allclose(s3, s1, atol=0)


def test_conjunctive_selective_decodes_fewer_quanta(small_index, small_oracle):
    """A rare∧hot conjunctive query must DECODE strictly fewer quanta
    than the hot term holds (block-selective decode, VERDICT r01 #5:
    the reference's whole point for skip pointers), while staying
    rank-identical to the oracle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.engine import _conjunctive_selective

    vocab = sorted(small_oracle.postings, key=lambda t: small_oracle.df(t))
    rare = vocab[0]
    hot = max(vocab, key=lambda t: small_oracle.df(t))
    stats_idx = small_index.stats
    pdf = (
        small_index.postings.where(F.col("term").isin([rare, hot]))
        .toPandas()
    )
    tgroups = []
    for term, grp in pdf.groupby("term", sort=True):
        gdf = small_oracle.df(term)
        tgroups.append(
            (gdf, bm25.idf(stats_idx["num_docs"], gdf), grp.sort_values("block_id"))
        )
    doclen_arr = np.array(
        [small_oracle.doclen[d] for d in range(small_oracle.num_docs)],
        dtype=np.int32,
    )
    stats = {}
    docids, scores = _conjunctive_selective(
        tgroups, doclen_arr, small_oracle.avgdl, 10,
        stats_idx["num_docs"], stats_idx.get("block_bits"),
        stats_idx["log2_quantum"], stats=stats,
    )
    want = small_oracle.bm25_topk([rare, hot], k=10, mode="conjunctive")
    assert docids.tolist() == [d for d, _ in want]
    assert np.allclose(scores, [s for _, s in want], atol=1e-9)
    assert stats["decoded"] < stats["total"], stats


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    """Skewed corpus — a hot term with weak postings everywhere except
    a strong-doc cluster, the real shape of boilerplate-heavy corpora."""
    from terrier_ef_spark.index.builder import build_index

    texts = []
    for d in range(400):
        if d < 10:  # strong docs: rare + heavy hot, short
            texts.append("rare " * 5 + "hot " * 10)
        elif d % 3 == 0:  # weak hot postings: tf=1, long doc
            texts.append("hot " + " ".join(f"w{d}x{j}" for j in range(60)))
        else:  # hot-free docs keep the hot term's idf positive
            texts.append(" ".join(f"w{d}x{j}" for j in range(60)))
    corpus = spark.createDataFrame(
        [("r", f"f{d:04d}", "c" * 40, "txt", t, d) for d, t in enumerate(texts)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    out = str(tmp_path_factory.mktemp("skew") / "idx")
    return build_index(spark, corpus, out, log2_quantum=3, n_partitions=4)


def _skew_tgroups(idx):
    from pyspark.sql import functions as F

    from terrier_ef_spark.query import bm25

    st = idx.stats
    pdf = idx.postings.where(F.col("term").isin(["rare", "hot"])).toPandas()
    lex = {r["term"]: r["df"] for r in idx.lexicon.where(
        F.col("term").isin(["rare", "hot"])).collect()}
    tgroups = [
        (lex[term], bm25.idf(st["num_docs"], lex[term]), grp.sort_values("block_id"))
        for term, grp in pdf.groupby("term", sort=True)
    ]
    dl = {r["docid"]: r["doclen"] for r in idx.docs.collect()}
    doclen_arr = np.array([dl[d] for d in range(st["num_docs"])], dtype=np.int32)
    return tgroups, doclen_arr


def test_bmw_selective_decodes_fewer_quanta(skew_index):
    """BMW now prunes DECODE, not just scoring (VERDICT r01 wrong #6):
    on the skewed corpus the hot term's cold quanta are never unpacked,
    and the top-k stays rank-identical to exhaustive scoring."""
    from terrier_ef_spark.query.engine import _bmw_selective, run_queries

    idx = skew_index
    st = idx.stats
    tgroups, doclen_arr = _skew_tgroups(idx)
    stats = {}
    docids, scores = _bmw_selective(
        tgroups, doclen_arr, st["avgdl"], 10,
        st["num_docs"], st.get("block_bits"), st["log2_quantum"], stats=stats,
    )
    # rank-identical to the exhaustive engine path
    want = (
        run_queries(idx, [{"qid": 1, "terms": ["rare", "hot"]}], k=10,
                    strategy="query_major", algo="naive")
        .orderBy("rank").collect()
    )
    assert docids.tolist() == [r["docid"] for r in want]
    assert np.allclose(scores, [r["score"] for r in want], atol=1e-9)
    # and the hot term's cold quanta were never decoded
    assert stats["decoded"] < stats["total"] / 2, stats


def test_maxscore_selective_decodes_fewer_quanta(skew_index):
    """Selective MaxScore on the same skewed corpus: the hot term goes
    non-essential (its term-level bound is below theta from the strong
    cluster), so only candidate quanta of it decode — rank-identical
    to exhaustive, decoding less than half the quanta."""
    from terrier_ef_spark.query.engine import _maxscore_selective, run_queries

    idx = skew_index
    st = idx.stats
    tgroups, doclen_arr = _skew_tgroups(idx)
    stats = {}
    docids, scores = _maxscore_selective(
        tgroups, doclen_arr, st["avgdl"], 10,
        st["num_docs"], st.get("block_bits"), st["log2_quantum"], stats=stats,
    )
    want = (
        run_queries(idx, [{"qid": 1, "terms": ["rare", "hot"]}], k=10,
                    strategy="query_major", algo="naive")
        .orderBy("rank").collect()
    )
    assert docids.tolist() == [r["docid"] for r in want]
    assert np.allclose(scores, [r["score"] for r in want], atol=1e-9)
    assert stats["decoded"] < stats["total"] / 2, stats


def test_maxscore_selective_engine_rank_identity(small_index, small_oracle, monkeypatch):
    """Force the selective cutover on and run algo='maxscore' through
    the engine on the adversarial small corpus (bounds never separate
    there, everything stays essential): rank identity must hold."""
    from terrier_ef_spark.query import engine as eng

    monkeypatch.setattr(eng, "QUERY_MAJOR_SELECTIVE_MIN_QUANTA", 0)
    got = _engine_results(small_index, "maxscore")
    want = _oracle_results(small_oracle)
    for q in QUERIES:
        qid = q["qid"]
        g, w = got[qid], want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


def test_bmw_actually_prunes(small_oracle):
    """On a rare-term + hot-term query, BMW must evaluate strictly fewer
    docs than the candidate union (pruning effectiveness), while staying
    rank-identical (covered by the other tests)."""
    from terrier_ef_spark.query import bm25

    vocab = sorted(small_oracle.postings, key=lambda t: small_oracle.df(t))
    rare = vocab[0]
    # largest-df term with POSITIVE idf (df < N/2): a negative-idf term
    # has all its block bounds capped at 0, which correctly disables
    # pruning (every doc's bound >= any negative threshold)
    hot = max(
        (t for t in vocab if small_oracle.df(t) < small_oracle.num_docs / 2),
        key=lambda t: small_oracle.df(t),
    )

    doclen_arr = np.array(
        [small_oracle.doclen[d] for d in range(small_oracle.num_docs)],
        dtype=np.int32,
    )
    tps = [_tp_for_test(small_oracle, t, doclen_arr) for t in (rare, hot)]
    stats = {}
    d_bmw, s_bmw = bm25.topk_bmw(tps, doclen_arr, small_oracle.avgdl, 10, stats_out=stats)
    d_ex, s_ex = bm25.topk_disjunctive(tps, doclen_arr, small_oracle.avgdl, 10)
    assert d_bmw.tolist() == d_ex.tolist()
    assert stats["survivors"] < stats["candidates"], stats


def test_maxscore_actually_prunes():
    """Rare + hot query, the textbook MaxScore case: the hot term's
    TERM-level upper bound falls below the threshold set by the rare
    term's exact seed scores, so it goes non-essential and the
    candidate set shrinks to the rare list — rank-identical to
    exhaustive throughout. Crafted heterogeneous-tf fixture: the
    synthetic corpus's near-uniform tf is adversarial to pruning by
    construction (BASELINE.md round-2 addendum 2), so term-level
    bounds only separate when tf actually varies."""
    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.bm25 import TermPostings

    rng = np.random.default_rng(11)
    n_docs = 5000
    doclen_arr = rng.integers(40, 80, n_docs).astype(np.int32)
    avgdl = float(doclen_arr.mean())

    def mk(term, docids, tfs, q=8):
        docids = np.asarray(docids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        n_q = (len(docids) + q - 1) // q
        q_last = docids[np.minimum(np.arange(1, n_q + 1) * q - 1, len(docids) - 1)]
        pad_tf = np.zeros(n_q * q, dtype=np.int64)
        pad_tf[: len(docids)] = tfs
        pad_dl = np.full(n_q * q, np.iinfo(np.int64).max, dtype=np.int64)
        pad_dl[: len(docids)] = doclen_arr[docids]
        return TermPostings(
            term=term,
            idf=bm25.idf(n_docs, len(docids)),
            docids=docids,
            tfs=tfs,
            q_last_docid=q_last,
            q_max_tf=pad_tf.reshape(n_q, q).max(axis=1),
            q_min_dl=pad_dl.reshape(n_q, q).min(axis=1),
        )

    rare_d = np.sort(rng.choice(n_docs, 40, replace=False))
    hot_d = np.sort(rng.choice(n_docs, 3000, replace=False))
    tps = [
        mk("rare", rare_d, rng.integers(20, 40, len(rare_d))),  # high tf
        mk("hot", hot_d, np.ones(len(hot_d))),                  # tf = 1 sea
    ]
    stats = {}
    d_ms, s_ms = bm25.topk_maxscore(tps, doclen_arr, avgdl, 10, stats_out=stats)
    d_ex, s_ex = bm25.topk_disjunctive(tps, doclen_arr, avgdl, 10)
    assert d_ms.tolist() == d_ex.tolist()
    assert np.allclose(s_ms, s_ex, atol=0)
    assert stats["n_essential"] == 1, stats
    assert stats["survivors"] < stats["candidates"] // 10, stats


def test_maxscore_term_major_routes_to_relational_bmw(small_index, small_oracle):
    """algo='maxscore' on the term-major strategy runs the relational
    BMW (both safe-to-k) — results identical to the oracle."""
    pdf = (
        run_queries(
            small_index,
            [q for q in QUERIES if q["mode"] == "disjunctive"],
            k=10,
            algo="maxscore",
            strategy="term_major",
        )
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {}
    for r in pdf.itertuples(index=False):
        got.setdefault(int(r.qid), []).append((int(r.docid), float(r.score)))
    for q in QUERIES:
        if q["mode"] != "disjunctive":
            continue
        want = small_oracle.bm25_topk(q["terms"], k=10, mode="disjunctive")
        g = got.get(q["qid"], [])
        assert [d for d, _ in g] == [d for d, _ in want], q
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q


def _tp_for_test(oracle, t, doclen_arr, q=8):
    from terrier_ef_spark.query.bm25 import TermPostings

    plist = oracle.postings[t]
    docids = np.array([d for d, _ in plist], dtype=np.int64)
    tfs = np.array([tf for _, tf in plist], dtype=np.int64)
    dls = doclen_arr[docids].astype(np.int64)
    n_q = (len(docids) + q - 1) // q
    q_last = docids[np.minimum(np.arange(1, n_q + 1) * q - 1, len(docids) - 1)]
    pad_tf = np.zeros(n_q * q, dtype=np.int64)
    pad_tf[: len(docids)] = tfs
    pad_dl = np.full(n_q * q, np.iinfo(np.int64).max, dtype=np.int64)
    pad_dl[: len(docids)] = dls
    return TermPostings(
        term=t, idf=oracle.idf(t), docids=docids, tfs=tfs,
        q_last_docid=q_last,
        q_max_tf=pad_tf.reshape(n_q, q).max(axis=1),
        q_min_dl=pad_dl.reshape(n_q, q).min(axis=1),
    )


def test_term_major_selective_rank_identity(small_index, small_oracle, monkeypatch):
    """With the selective-decode cutover forced on, the term-major
    scorer (rarest-term full decode + candidate-routed selective decode
    of the other conjunctive terms) stays rank-identical to the
    oracle on the full mixed query set."""
    import terrier_ef_spark.query.engine as eng

    monkeypatch.setattr(eng, "TERM_MAJOR_SELECTIVE_QUANTA_FACTOR", -1)
    pdf = (
        run_queries(small_index, QUERIES, k=10, strategy="term_major")
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {q["qid"]: [] for q in QUERIES}
    for r in pdf.itertuples(index=False):
        got[int(r.qid)].append((int(r.docid), float(r.score)))
    want = _oracle_results(small_oracle)
    for q in QUERIES:
        qid = q["qid"]
        g, w = got[qid], want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], (qid, g, w)
        assert np.allclose([s for _, s in g], [s for _, s in w], atol=1e-9), qid


def test_decode_postings_selective_skips_quanta(small_index, small_oracle):
    """decode_postings_selective on a rare∧hot candidate routing: output
    equals the membership-filtered full decode, and the decoded-quanta
    accumulator shows real skipping (decoded < total)."""
    from terrier_ef_spark.query.engine import (
        decode_postings,
        decode_postings_selective,
    )

    spark = small_index.spark
    rare = "v150"
    hot = "the"
    cand_docs = sorted(d for d, _ in small_oracle.postings[rare])
    cand = spark.createDataFrame(
        [(hot, d) for d in cand_docs], "term string, docid long"
    )
    acc_dec = spark.sparkContext.accumulator(0)
    acc_tot = spark.sparkContext.accumulator(0)
    got = {
        (r.term, int(r.docid), int(r.tf))
        for r in decode_postings_selective(
            small_index, cand, [hot], acc=(acc_dec, acc_tot)
        ).collect()
    }
    full = {
        (r.term, int(r.docid), int(r.tf))
        for r in decode_postings(small_index, terms=[hot]).collect()
        if int(r.docid) in set(cand_docs)
    }
    assert got == full and len(got) > 0
    assert 0 < acc_dec.value < acc_tot.value, (acc_dec.value, acc_tot.value)


def test_decode_selective_randomized(spark, tmp_path):
    """Randomized differential: on a fresh skewed corpus, selective
    decode with random candidate sets (hits, misses, out-of-range)
    equals the membership-filtered full decode for every sampled term."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import (
        decode_postings,
        decode_postings_selective,
    )

    corpus = synthesize_corpus(spark, 300, seed=9, n_partitions=4)
    idx = build_index(
        spark, corpus, str(tmp_path / "selrand"), log2_quantum=3,
        block_bits=6, n_partitions=4,
    )
    full = {}
    for r in decode_postings(idx).collect():
        full.setdefault(r.term, {})[int(r.docid)] = int(r.tf)
    rng = np.random.default_rng(17)
    terms = sorted(full)
    sampled = [terms[i] for i in rng.choice(len(terms), size=8, replace=False)]
    rows = []
    want = set()
    for t in sampled:
        docs = sorted(full[t])
        hits = rng.choice(docs, size=min(5, len(docs)), replace=False)
        misses = rng.integers(0, 300, size=4)      # mostly absent docids
        out_of_range = [10_000 + int(x) for x in rng.integers(0, 50, size=2)]
        cands = {int(d) for d in hits} | {int(d) for d in misses} | set(out_of_range)
        rows += [(t, d) for d in sorted(cands)]
        want |= {(t, d, full[t][d]) for d in cands if d in full[t]}
    cand = spark.createDataFrame(rows, "term string, docid long")
    got = {
        (r.term, int(r.docid), int(r.tf))
        for r in decode_postings_selective(idx, cand, sampled).collect()
    }
    assert got == want


def test_bmw_term_major_prunes_heterogeneous(spark, tmp_path, monkeypatch):
    """Decode-volume proof for the relational BMW: on a corpus with
    heterogeneous tf (a few high-tf 'relevant' docs among a sea of
    tf=1 postings — BMW's published premise), the survivor decode
    unpacks a small fraction of the matched quanta, and the result is
    rank-identical to exhaustive."""
    import terrier_ef_spark.query.engine as eng
    from terrier_ef_spark.index.builder import build_index

    n, n_rel = 4000, 20
    rows = []
    for i in range(n):
        toks = []
        if i % 10 == 0:  # needle in 10% of docs -> positive idf
            toks += ["needle"] * (30 if i % (n // n_rel) == 0 else 1)
        toks += [f"pad{j}" for j in range(i % 7)] + ["filler"] * 10
        rows.append(("r", f"f{i:05d}.py", "c0", "py", " ".join(toks)))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "bmwhet"), log2_quantum=3,
        block_bits=8, n_partitions=4,
    )
    monkeypatch.setattr(eng, "BMW_TERM_MAJOR_MIN_POSTINGS", 0)

    decoded = []
    orig = eng.decode_postings_by_quanta
    def spy(index, picks):
        from pyspark.sql import functions as F
        decoded.append(
            picks.select(F.sum(F.size("qidx")).alias("s")).collect()[0]["s"]
        )
        return orig(index, picks)
    monkeypatch.setattr(eng, "decode_postings_by_quanta", spy)

    q = [{"qid": 1, "terms": ["needle"], "mode": "disjunctive"}]
    got = eng.run_queries(idx, q, k=10, algo="bmw", strategy="term_major") \
        .orderBy("rank").collect()
    monkeypatch.setattr(eng, "decode_postings_by_quanta", orig)
    want = eng.run_queries(idx, q, k=10, strategy="term_major") \
        .orderBy("rank").collect()
    assert [(r.qid, r.rank, r.docid) for r in got] == [
        (r.qid, r.rank, r.docid) for r in want
    ]
    assert np.allclose([r.score for r in got], [r.score for r in want], atol=1e-9)
    # true quantum total incl. block fragmentation, from the index itself
    from pyspark.sql import functions as F
    total_quanta = (
        idx.postings.where(F.col("term") == "needle")
        .select(F.sum(F.size("q_last_docid")).alias("s"))
        .collect()[0]["s"]
    )
    survivor_quanta = decoded[-1]
    assert survivor_quanta < 0.5 * total_quanta, (survivor_quanta, total_quanta)


def test_bmw_term_major_prunes_multiterm(spark, tmp_path, monkeypatch):
    """Decode-volume proof for the QUANTUM-ALIGNED relational BMW on the
    common multi-term shape (VERDICT r02 missing #1): three query terms
    in disjoint doc residues (tf=1) plus 'super' docs carrying all
    three at tf=20, spaced so EVERY docid-range block contains one —
    the block-aligned r02 bound prunes ~0% here by construction (each
    block's per-term max dominates theta everywhere), while docid-
    overlap alignment kills every quantum not overlapping a super doc.
    Result must stay rank-identical to exhaustive."""
    import terrier_ef_spark.query.engine as eng
    from terrier_ef_spark.index.builder import build_index

    n = 4000
    rows = []
    for i in range(n):
        if i % 200 == 3:  # super doc: all three terms, tf=20, dl=61
            toks = ["filler"] + ["alpha"] * 20 + ["bravo"] * 20 + ["charlie"] * 20
        else:  # dl=61 everywhere so tfn-normalization is flat
            toks = ["filler"] * 60
            if i % 5 == 0:
                toks += ["alpha"]
            elif i % 5 == 1:
                toks += ["bravo"]
            elif i % 5 == 2:
                toks += ["charlie"]
            else:
                toks += ["filler"]
        rows.append(("r", f"f{i:05d}.py", "c0", "py", " ".join(toks)))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "bmwmulti"), log2_quantum=3,
        block_bits=8, n_partitions=4,
    )
    monkeypatch.setattr(eng, "BMW_TERM_MAJOR_MIN_POSTINGS", 0)

    decoded = []
    orig = eng.decode_postings_by_quanta
    def spy(index, picks):
        from pyspark.sql import functions as F
        decoded.append(
            picks.select(F.sum(F.size("qidx")).alias("s")).collect()[0]["s"]
        )
        return orig(index, picks)
    monkeypatch.setattr(eng, "decode_postings_by_quanta", spy)

    q = [{"qid": 1, "terms": ["alpha", "bravo", "charlie"], "mode": "disjunctive"}]
    got = eng.run_queries(idx, q, k=10, algo="bmw", strategy="term_major") \
        .orderBy("rank").collect()
    monkeypatch.setattr(eng, "decode_postings_by_quanta", orig)
    want = eng.run_queries(idx, q, k=10, strategy="term_major") \
        .orderBy("rank").collect()
    assert [(r.qid, r.rank, r.docid) for r in got] == [
        (r.qid, r.rank, r.docid) for r in want
    ]
    assert np.allclose([r.score for r in got], [r.score for r in want], atol=1e-9)
    from pyspark.sql import functions as F
    total_quanta = (
        idx.postings.where(F.col("term").isin(["alpha", "bravo", "charlie"]))
        .select(F.sum(F.size("q_last_docid")).alias("s"))
        .collect()[0]["s"]
    )
    survivor_quanta = decoded[-1]
    assert 0 < survivor_quanta < 0.7 * total_quanta, (survivor_quanta, total_quanta)
    print(f"\nmultiterm BMW: {survivor_quanta}/{total_quanta} quanta decoded "
          f"({1 - survivor_quanta/total_quanta:.0%} pruned)")


def test_doc_filter_rank_identity_vs_oracle(small_index, small_oracle):
    """Filtered retrieval == oracle scoring restricted to the allowed
    set (statistics corpus-global), on mixed dis/conjunctive queries."""
    spark = small_index.spark
    allowed = [d for d in range(400) if d % 3 == 0]
    filt = spark.createDataFrame([(d,) for d in allowed], "docid long")
    got_pdf = (
        run_queries(
            small_index, QUERIES, k=10, strategy="term_major", doc_filter=filt
        )
        .orderBy("qid", "rank")
        .toPandas()
    )
    got = {q["qid"]: [] for q in QUERIES}
    for r in got_pdf.itertuples(index=False):
        got[int(r.qid)].append((int(r.docid), float(r.score)))
    allow = set(allowed)
    for q in QUERIES:
        full = small_oracle.bm25_topk(q["terms"], k=10**9, mode=q["mode"])
        want = [(d, s) for d, s in full if d in allow][:10]
        g = got[q["qid"]]
        assert [d for d, _ in g] == [d for d, _ in want], (q["qid"], g, want)
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q["qid"]


def test_doc_filter_misuse_raises(small_index):
    spark = small_index.spark
    filt = spark.createDataFrame([(0,)], "docid long")
    qs = [{"qid": 1, "terms": ["the"], "mode": "disjunctive"}]
    with pytest.raises(ValueError, match="exhaustive term-major"):
        run_queries(small_index, qs, algo="bmw", doc_filter=filt)
    with pytest.raises(ValueError, match="term-major only"):
        run_queries(small_index, qs, strategy="query_major", doc_filter=filt)


def test_not_terms_exclusion(spark, small_index):
    """Boolean MUST_NOT: excluded docs never appear, results equal the
    doc_filter-complement formulation, and misuse raises."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.query.engine import decode_postings

    q = [{"qid": 1, "terms": ["the", "import"], "mode": "disjunctive",
          "not_terms": ["def"]}]
    got = run_queries(small_index, q, k=15).collect()
    banned = {r["docid"]
              for r in decode_postings(small_index, ["def"]).collect()}
    assert banned and not ({r["docid"] for r in got} & banned)

    allowed = small_index.docs.select("docid").where(
        ~F.col("docid").isin(sorted(banned))
    )
    want = run_queries(
        small_index,
        [{"qid": 1, "terms": ["the", "import"], "mode": "disjunctive"}],
        k=15, doc_filter=allowed,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and got

    with pytest.raises(ValueError, match="not_terms"):
        run_queries(small_index, q, k=5, algo="bmw")
    with pytest.raises(ValueError, match="not_terms"):
        run_queries(small_index, q, k=5, strategy="query_major")


def test_term_filter_pushdown_plan_shape(spark, small_index):
    """Plan regression guard: the term-major scorer's postings scan must
    carry the query terms as a parquet PushedFilters In(term, ...) —
    losing the pushdown would silently turn every query into a full
    postings scan at scale."""
    df = run_queries(
        small_index,
        [{"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"}],
        k=5, strategy="term_major",
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    pushed = [p for p in re.findall(r"PushedFilters: \[[^\]]*\]", plan)
              if "In(term" in p]
    assert pushed, plan[:2000]
    assert any("import" in p and "def" in p for p in pushed)


def test_positions_column_pruned_for_scoring(spark, small_index):
    """The lazy-decode property as a plan guard: scoring queries on a
    POSITIONAL index must not read positions_ef — the scan's ReadSchema
    excludes it (SURVEY.md §4 'Lazy decode')."""
    df = run_queries(
        small_index,
        [{"qid": 1, "terms": ["import"], "mode": "disjunctive"}],
        k=5, strategy="term_major",
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    schemas = [s for s in re.findall(r"ReadSchema: [^\n]*", plan)
               if "docids_ef" in s]
    assert schemas, plan[:2000]  # the postings scan is present
    assert all("positions_ef" not in s for s in schemas), schemas


def test_query_major_small_batch_single_exchange(spark, small_index):
    """Plan regression guard for the small-batch fast path: the
    query-major fanout must be a literal map explode folded into the
    scan (no broadcast-join exchanges, no LocalTableScan from a
    driver-built qterms relation) — exactly ONE shuffle exchange, the
    groupBy(qid) feeding the kernel. Losing this re-adds ~0.6s of
    per-call fixed cost on interactive batches."""
    df = run_queries(
        small_index,
        [{"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
         {"qid": 2, "terms": ["class"], "mode": "disjunctive"}],
        k=5, strategy="query_major",
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re as _re

    assert "BroadcastExchange" not in plan, plan[:3000]
    assert "LocalTableScan" not in plan, plan[:3000]
    # exactly one exchange NODE (formatted mode lists each node twice:
    # once in the tree, once in the detail section)
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]
    assert "Generate" in plan  # the explode fanout
