"""Bo1 pseudo-relevance-feedback expansion: the two-pass engine
pipeline (EF index first pass -> direct-index candidate gathering ->
Bo1 weights -> weighted second pass) vs an independent pure-Python
mirror over the oracle index."""

from __future__ import annotations

import numpy as np
import pytest

QUERIES = [
    {"qid": 1, "terms": ["the"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["v150", "v73"], "mode": "disjunctive"},
    {"qid": 4, "terms": ["zzz_absent_zzz"], "mode": "disjunctive"},
]
FB_DOCS, FB_TERMS = 3, 10


@pytest.fixture(scope="module")
def direct(small_index):
    from terrier_ef_spark.index.direct import build_direct

    return build_direct(small_index, n_partitions=4)


def _py_bo1(oracle, q):
    """Independent Bo1 mirror: plain dict/loop re-derivation."""
    from terrier_ef_spark.query.expansion import bo1_weight

    ranked = oracle.bm25_topk(q["terms"], k=10_000)
    ranked = sorted(ranked, key=lambda kv: (-round(kv[1], 6), kv[0]))[:FB_DOCS]
    fb = [d for d, _ in ranked]
    if not fb:
        return dict.fromkeys(q["terms"], 1.0)
    tfx: dict[str, int] = {}
    for t, plist in oracle.postings.items():
        for d, tf in plist:
            if d in fb:
                tfx[t] = tfx.get(t, 0) + tf
    w = {
        t: round(bo1_weight(x, oracle.cf(t), oracle.num_docs), 6)
        for t, x in tfx.items()
    }
    sel = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    wmax = max(v for _, v in sel)
    weights = dict.fromkeys(dict.fromkeys(q["terms"]), 1.0)
    for t, v in sel:
        weights[t] = weights.get(t, 0.0) + v / wmax
    return {t: round(v, 6) for t, v in weights.items()}


def test_bo1_expansion_matches_python_mirror(small_index, small_oracle, direct):
    from terrier_ef_spark.query.expansion import run_queries_bo1

    got = (
        run_queries_bo1(
            small_index, QUERIES, k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
            strategy="term_major", direct=direct,
        )
        .orderBy("qid", "rank")
        .collect()
    )
    by_qid: dict[int, list] = {q["qid"]: [] for q in QUERIES}
    for r in got:
        by_qid[int(r["qid"])].append((int(r["docid"]), float(r["score"])))

    for q in QUERIES:
        weights = _py_bo1(small_oracle, q)
        scores: dict[int, float] = {}
        for t, w in weights.items():
            for d, tf in small_oracle.postings.get(t, []):
                scores[d] = scores.get(d, 0.0) + w * small_oracle.score(t, d, tf)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = by_qid[q["qid"]]
        assert [d for d, _ in g] == [d for d, _ in want], (q["qid"], g, want)
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q["qid"]


def _py_kl(oracle, q):
    """Independent KL mirror: plain dict/loop re-derivation."""
    from terrier_ef_spark.query.expansion import kl_weight

    ranked = oracle.bm25_topk(q["terms"], k=10_000)
    ranked = sorted(ranked, key=lambda kv: (-round(kv[1], 6), kv[0]))[:FB_DOCS]
    fb = [d for d, _ in ranked]
    if not fb:
        return dict.fromkeys(q["terms"], 1.0)
    fb_len = float(sum(oracle.doclen[d] for d in fb))
    tfx: dict[str, int] = {}
    for t, plist in oracle.postings.items():
        for d, tf in plist:
            if d in fb:
                tfx[t] = tfx.get(t, 0) + tf
    w = {
        t: round(kl_weight(x, fb_len, oracle.cf(t), oracle.num_tokens), 6)
        for t, x in tfx.items()
    }
    sel = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    wmax = max(v for _, v in sel)
    weights = dict.fromkeys(dict.fromkeys(q["terms"]), 1.0)
    for t, v in sel:
        weights[t] = weights.get(t, 0.0) + v / wmax
    return {t: round(v, 6) for t, v in weights.items()}


def _py_bo2(oracle, q):
    """Independent Bo2 mirror: plain dict/loop re-derivation."""
    from terrier_ef_spark.query.expansion import bo2_weight

    ranked = oracle.bm25_topk(q["terms"], k=10_000)
    ranked = sorted(ranked, key=lambda kv: (-round(kv[1], 6), kv[0]))[:FB_DOCS]
    fb = [d for d, _ in ranked]
    if not fb:
        return dict.fromkeys(q["terms"], 1.0)
    fb_len = float(sum(oracle.doclen[d] for d in fb))
    tfx: dict[str, int] = {}
    for t, plist in oracle.postings.items():
        for d, tf in plist:
            if d in fb:
                tfx[t] = tfx.get(t, 0) + tf
    w = {
        t: round(bo2_weight(x, fb_len, oracle.cf(t), oracle.num_tokens), 6)
        for t, x in tfx.items()
    }
    sel = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    wmax = max(v for _, v in sel)
    weights = dict.fromkeys(dict.fromkeys(q["terms"]), 1.0)
    for t, v in sel:
        weights[t] = weights.get(t, 0.0) + v / wmax
    return {t: round(v, 6) for t, v in weights.items()}


def test_bo2_expansion_matches_python_mirror(small_index, small_oracle, direct):
    from terrier_ef_spark.query.expansion import run_queries_prf

    got = (
        run_queries_prf(
            small_index, QUERIES, model="bo2", k=10, fb_docs=FB_DOCS,
            fb_terms=FB_TERMS, strategy="term_major", direct=direct,
        )
        .orderBy("qid", "rank")
        .collect()
    )
    by_qid: dict[int, list] = {q["qid"]: [] for q in QUERIES}
    for r in got:
        by_qid[int(r["qid"])].append((int(r["docid"]), float(r["score"])))

    for q in QUERIES:
        weights = _py_bo2(small_oracle, q)
        scores: dict[int, float] = {}
        for t, w in weights.items():
            for d, tf in small_oracle.postings.get(t, []):
                scores[d] = scores.get(d, 0.0) + w * small_oracle.score(t, d, tf)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = by_qid[q["qid"]]
        assert [d for d, _ in g] == [d for d, _ in want], (q["qid"], g, want)
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q["qid"]


def test_kl_expansion_matches_python_mirror(small_index, small_oracle, direct):
    from terrier_ef_spark.query.expansion import run_queries_prf

    got = (
        run_queries_prf(
            small_index, QUERIES, model="kl", k=10, fb_docs=FB_DOCS,
            fb_terms=FB_TERMS, strategy="term_major", direct=direct,
        )
        .orderBy("qid", "rank")
        .collect()
    )
    by_qid: dict[int, list] = {q["qid"]: [] for q in QUERIES}
    for r in got:
        by_qid[int(r["qid"])].append((int(r["docid"]), float(r["score"])))

    for q in QUERIES:
        weights = _py_kl(small_oracle, q)
        scores: dict[int, float] = {}
        for t, w in weights.items():
            for d, tf in small_oracle.postings.get(t, []):
                scores[d] = scores.get(d, 0.0) + w * small_oracle.score(t, d, tf)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = by_qid[q["qid"]]
        assert [d for d, _ in g] == [d for d, _ in want], (q["qid"], g, want)
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q["qid"]


def test_bo1_expanded_terms_widen_the_query(small_index, small_oracle, direct):
    """Expansion must add terms beyond the originals (the point of PRF),
    and expanded weights are positive."""
    from terrier_ef_spark.query.expansion import expand_queries_bo1, run_queries

    deep = run_queries(
        small_index, QUERIES[:1], k=FB_DOCS, strategy="term_major"
    ).collect()
    first_pass = [(int(r["qid"]), int(r["docid"])) for r in deep]
    out = expand_queries_bo1(
        small_index, QUERIES[:1], first_pass, fb_terms=FB_TERMS, direct=direct
    )
    assert len(out[0]["terms"]) > 1  # "the" plus expansion terms
    assert all(v > 0 for v in out[0]["weights"].values())


def test_prefix_query_rewrite(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.query.expansion import expand_prefix, run_queries_prefix

    docs = {
        0: "spark sparse spot apple",
        1: "spark spark spectrum apple banana",
        2: "sparse spot spot apple apple",
        3: "banana apple spectrum",
    }
    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(docs.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("prefix") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    # df: spark=2, sparse=2, spectrum=2, spot=2 -> df-tie, term asc
    assert expand_prefix(idx, "sp") == ["spark", "sparse", "spectrum", "spot"]
    assert expand_prefix(idx, "sp", max_expansions=2) == ["spark", "sparse"]
    assert expand_prefix(idx, "zz") == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty prefix"):
        expand_prefix(idx, "")

    got = run_queries_prefix(idx, [{"qid": 7, "prefix": "sp"}], k=10).collect()
    want = run_queries(
        idx,
        [{"qid": 7, "terms": ["spark", "sparse", "spectrum", "spot"],
          "mode": "disjunctive"}],
        k=10, strategy="term_major",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and got
    assert run_queries_prefix(idx, [{"qid": 1, "prefix": "zz"}]).count() == 0


def test_fuzzy_query_rewrite(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.query.expansion import expand_fuzzy, run_queries_fuzzy

    docs = {
        0: "table cable stable apple",          # 1-edit family of 'table'
        1: "table table fable apple banana",
        2: "cable fable apple apple",
        3: "banana apple orange",
        4: "ab ba apple",                       # 'ab'~'ba': the distance-2
    }                                           # delete-trick false positive
    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(docs.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("fuzzy") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    # deletion ('tble' is 1 edit from 'table'), plus the exact term
    # df: table=2, cable=2, fable=2, stable=1
    assert expand_fuzzy(idx, "table") == ["cable", "fable", "table", "stable"]
    # 'fable','cable' are 1 sub away; 'stable' 1 insert; all found
    assert expand_fuzzy(idx, "tble") == ["table"]      # delete in query
    assert expand_fuzzy(idx, "tables") == ["table"]    # insert in query
    assert expand_fuzzy(idx, "tabls") == ["table"]     # substitution
    # the delete-trick's distance-2 false positive must be verified away
    assert expand_fuzzy(idx, "ab") == ["ab"]           # NOT 'ba'
    assert expand_fuzzy(idx, "zzzzz") == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        expand_fuzzy(idx, "")

    got = run_queries_fuzzy(idx, [{"qid": 5, "term": "tble"}], k=10).collect()
    want = run_queries(
        idx, [{"qid": 5, "terms": ["table"], "mode": "disjunctive"}],
        k=10, strategy="term_major",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and got


def _py_rm3(oracle, q, alpha=0.5):
    """Independent RM3 mirror: plain dict/loop re-derivation
    (Abdul-Jaleel et al. TREC'04 via the unnormalized-RM1 form)."""
    ranked = oracle.bm25_topk(q["terms"], k=10_000)
    ranked = sorted(
        ranked, key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:FB_DOCS]
    if not ranked:
        return dict.fromkeys(dict.fromkeys(q["terms"]), 1.0)
    s6 = {d: round(s, 6) for d, s in ranked}
    rm1: dict[str, float] = {}
    for t, plist in oracle.postings.items():
        for d, tf in plist:
            if d in s6:
                rm1[t] = rm1.get(t, 0.0) + s6[d] * tf / oracle.doclen[d]
    rm1 = {t: round(v, 6) for t, v in rm1.items()}
    sel = sorted(rm1.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    w_sum = sum(v for _, v in sorted(sel))
    if w_sum == 0.0:
        return dict.fromkeys(dict.fromkeys(q["terms"]), 1.0)
    orig = list(dict.fromkeys(q["terms"]))
    weights = {t: alpha / len(orig) for t in orig}
    for t, v in sel:
        weights[t] = weights.get(t, 0.0) + (1 - alpha) * v / w_sum
    return {t: round(v, 6) for t, v in weights.items()}


def test_rm3_expansion_matches_python_mirror(small_index, small_oracle, direct):
    from terrier_ef_spark.query.expansion import run_queries_rm3

    got = (
        run_queries_rm3(
            small_index, QUERIES, k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
            strategy="term_major", direct=direct,
        )
        .orderBy("qid", "rank")
        .collect()
    )
    by_qid: dict[int, list] = {q["qid"]: [] for q in QUERIES}
    for r in got:
        by_qid[int(r["qid"])].append((int(r["docid"]), float(r["score"])))

    for q in QUERIES:
        weights = _py_rm3(small_oracle, q)
        scores: dict[int, float] = {}
        for t, w in weights.items():
            for d, tf in small_oracle.postings.get(t, []):
                scores[d] = scores.get(d, 0.0) + w * small_oracle.score(t, d, tf)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = by_qid[q["qid"]]
        assert [d for d, _ in g] == [d for d, _ in want], (q["qid"], g, want)
        assert np.allclose(
            [s for _, s in g], [s for _, s in want], atol=1e-9
        ), q["qid"]


def test_rm3_weights_form_a_mixture(small_index, small_oracle, direct):
    """The reformulated weights are a convex alpha-mixture: original
    terms carry alpha/|Q| plus any feedback mass; selected expansion
    weights sum to (1 - alpha) exactly (before rounding)."""
    q = {"qid": 2, "terms": ["import", "def"], "mode": "disjunctive"}
    weights = _py_rm3(small_oracle, q, alpha=0.5)
    total = sum(weights.values())
    # alpha * 1 (query mass) + (1-alpha) * 1 (renormalized RM1 mass)
    assert total == pytest.approx(1.0, abs=1e-4)
    for t in q["terms"]:
        assert weights[t] >= 0.5 / len(q["terms"]) - 1e-6


def test_spell_suggestions(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.expansion import suggest_corrections

    docs = {
        0: "table cable stable apple",
        1: "table table fable apple banana",
        2: "cable fable apple apple",
        3: "banana apple orange",
        4: "ab ba apple",
    }
    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(docs.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("spell") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    out = suggest_corrections(
        idx,
        [
            # 'tble': OOV, 1-edit family; 'apple': known -> no rows
            {"qid": 1, "terms": ["tble", "apple"]},
            # 'zzzzz': OOV, no neighbours; 'cble': OOV -> 'cable'
            {"qid": 2, "terms": ["zzzzz", "cble"]},
            # OOV 'ab'-like probe: 'abb' is distance 1 from BOTH 'ab'
            # and 'ba'... no: 'abb'->'ab' (delete), 'abb'->'ba' is 2.
            {"qid": 3, "terms": ["abb"]},
        ],
        n_suggest=3,
    ).collect()
    got = {(r.qid, r.term): [] for r in out}
    for r in sorted(out, key=lambda r: (r.qid, r.term, r.rank)):
        got[(r.qid, r.term)].append((r.rank, r.suggestion, r.df))
    # df: table=2, cable=2, fable=2, stable=1, ab=1, ba=1
    assert got[(1, "tble")] == [(1, "table", 2)]
    assert (2, "zzzzz") not in got          # no neighbours
    assert got[(2, "cble")] == [(1, "cable", 2)]
    assert got[(3, "abb")] == [(1, "ab", 1)]   # NOT 'ba' (distance 2)
    assert not [k for k in got if k[1] == "apple"]  # known term: no rows

    # n_suggest cap + (df desc, term asc) ordering on a rich family:
    # raising max_df_known makes even the known 'table' (df=2)
    # eligible; its distance-1 family is cable/fable (df 2) and
    # stable (df 1), itself excluded — the cap keeps the df-then-term
    # leaders
    fam = suggest_corrections(
        idx, [{"qid": 9, "terms": ["table"]}], n_suggest=2, max_df_known=5
    ).collect()
    assert [(r.rank, r.suggestion) for r in sorted(fam, key=lambda r: r.rank)] \
        == [(1, "cable"), (2, "fable")]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        suggest_corrections(idx, [{"qid": 1, "terms": []}])
    with _pytest.raises(ValueError):
        suggest_corrections(idx, [{"qid": 1, "terms": ["x"]}], n_suggest=0)


def test_more_like_this(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.direct import build_direct
    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.query.expansion import (
        more_like_this_terms,
        run_more_like_this,
    )

    # doc 0's signature terms: 'cable' (rare) beats 'apple' (everywhere)
    docs = {
        0: "cable table apple",
        1: "cable table apple wire",
        2: "table apple fruit",
        3: "apple fruit banana",
        4: "banana orange apple",
    }
    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(docs.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("mlt") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    direct = build_direct(idx, n_partitions=2)

    # term selection: tf*log2(N/df) ranks cable (log2(5/2)) above table
    # (log2(5/3)) above apple (log2(5/5)=0)
    qd = more_like_this_terms(
        idx, [{"qid": 1, "docid": 0}], max_terms=2, direct=direct
    )
    assert qd == [{"qid": 1, "terms": ["cable", "table"],
                   "mode": "disjunctive"}]

    # retrieval: source excluded; doc 1 (cable+table) must lead
    out = run_more_like_this(
        idx, [{"qid": 1, "docid": 0}], max_terms=2, k=10, direct=direct
    ).collect()
    got = [(r.rank, r.docid) for r in sorted(out, key=lambda r: r.rank)]
    assert got[0] == (1, 1)
    assert all(r.docid != 0 for r in out)  # MLT never returns the source

    # result set == plain BM25 over the selected terms minus the source
    want = run_queries(
        idx, qd, k=10, strategy="term_major"
    ).where("docid <> 0").collect()
    assert sorted((r.docid, round(r.score, 9)) for r in out) == sorted(
        (r.docid, round(r.score, 9)) for r in want
    )

    # a source docid that does not exist yields no rows for that qid
    empty = run_more_like_this(
        idx, [{"qid": 9, "docid": 999}], direct=direct
    )
    assert empty.count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        more_like_this_terms(idx, [], direct=direct)
    with _pytest.raises(ValueError):
        more_like_this_terms(
            idx, [{"qid": 1, "docid": 0}], max_terms=0, direct=direct
        )


def test_suggest_completions(small_index, small_oracle, spark):
    """Batched autocompletion: per-prefix df-desc/term-asc top-n from
    one lexicon pass, vs a plain dict mirror over the oracle index."""
    from terrier_ef_spark.query.expansion import suggest_completions

    # pick two live prefixes from the vocabulary + one with no matches
    vocab = sorted(small_oracle.postings)
    p1, p2 = vocab[0][:2], vocab[len(vocab) // 2][:2]
    prefixes = [p1, p2, "zzzz"]
    n = 5
    got = {}
    rows = suggest_completions(small_index, prefixes, n_suggest=n).collect()
    for r in rows:
        got.setdefault(r["prefix"], []).append((r["term"], r["df"]))
    for p in got:
        got[p].sort(key=lambda td: (-td[1], td[0]))
    want = {}
    for p in (p1, p2):
        cands = [
            (t, len(small_oracle.postings[t]))
            for t in vocab
            if t.startswith(p)
        ]
        cands.sort(key=lambda td: (-td[1], td[0]))
        if cands:
            want[p] = cands[:n]
    assert got == want
    assert "zzzz" not in got
    # min_df cuts the tail: every surviving df respects the floor
    floor = max(df for _, df in want[p1]) if want.get(p1) else 1
    rows2 = suggest_completions(
        small_index, [p1], n_suggest=n, min_df=floor
    ).collect()
    assert rows2 and all(r["df"] >= floor for r in rows2)
    # guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no prefixes"):
        suggest_completions(small_index, [])
    with _pytest.raises(ValueError, match="empty prefix"):
        suggest_completions(small_index, ["ab", ""])
    with _pytest.raises(ValueError, match="n_suggest"):
        suggest_completions(small_index, ["ab"], n_suggest=0)
    with _pytest.raises(ValueError, match="min_df"):
        suggest_completions(small_index, ["ab"], min_df=0)
