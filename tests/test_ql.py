"""Terrier-style query language (query/parser.py): parse-level unit
tests plus rank-identity of every operator against a hand-composed call
of the engine primitives it compiles to (the same differential
discipline as test_queries.py — the parser must add syntax, never new
semantics)."""

from __future__ import annotations

import pytest

from terrier_ef_spark.query.parser import (
    QLClause,
    compile_query,
    parse_query,
    run_queries_ql,
)


def _rows(df):
    return sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in df.collect()
    )


# ---------------------------------------------------------------------------
# parse_query (pure, no Spark)
# ---------------------------------------------------------------------------

def test_parse_terms_boosts_ops():
    got = parse_query('spark sql^2.5 +req -not')
    assert got == [
        QLClause("term", ("spark",)),
        QLClause("term", ("sql",), "", 2.5),
        QLClause("term", ("req",), "+"),
        QLClause("term", ("not",), "-"),
    ]


def test_parse_phrases_windows_expansions():
    got = parse_query('"hello world" "a b c"~4^2 tab* fuzz~ -"bad pair"')
    assert got == [
        QLClause("phrase", ("hello", "world")),
        QLClause("phrase", ("a", "b", "c"), "", 2.0, 4),
        QLClause("term", ("tab",), expand="prefix"),
        QLClause("term", ("fuzz",), expand="fuzzy"),
        QLClause("phrase", ("bad", "pair"), "-"),
    ]


def test_parse_single_word_phrase_degenerates():
    assert parse_query('"solo"') == [QLClause("term", ("solo",))]


@pytest.mark.parametrize(
    "bad",
    ['"unbalanced', '+"dangling', '""', "term^0", "term^-1", "-pro^2",
     '-"a b"^2', "+pre*", "+fuz~", "", "   ", "^2"],
)
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


# ---------------------------------------------------------------------------
# compile + execute vs hand-composed engine calls (small_index fixture:
# simple tokenizer, positions=True)
# ---------------------------------------------------------------------------

def test_ql_boost_and_qtf_identity(small_index):
    from terrier_ef_spark.query.engine import run_queries

    # 'def def import^1' == weights {def: 2.0}; explicit ^1 is weight 1
    ql = run_queries_ql(
        small_index, [{"qid": 1, "query": "def def import^1"}], k=10
    )
    manual = run_queries(
        small_index,
        [{"qid": 1, "terms": ["def", "import"], "weights": {"def": 2.0},
          "mode": "disjunctive"}],
        k=10, strategy="term_major",
    )
    assert _rows(ql) == _rows(manual)


def test_ql_boost_fractional(small_index):
    from terrier_ef_spark.query.engine import run_queries

    ql = run_queries_ql(
        small_index, [{"qid": 3, "query": "def^0.5 import"}], k=10
    )
    manual = run_queries(
        small_index,
        [{"qid": 3, "terms": ["def", "import"], "weights": {"def": 0.5},
          "mode": "disjunctive"}],
        k=10, strategy="term_major",
    )
    assert _rows(ql) == _rows(manual)


def test_ql_not_terms_identity(small_index):
    from terrier_ef_spark.query.engine import run_queries

    ql = run_queries_ql(
        small_index, [{"qid": 1, "query": "def import -val"}], k=10
    )
    manual = run_queries(
        small_index,
        [{"qid": 1, "terms": ["def", "import"], "not_terms": ["val"],
          "mode": "disjunctive"}],
        k=10, strategy="term_major",
    )
    assert _rows(ql) == _rows(manual)


def test_ql_all_required_is_conjunctive(small_index):
    from terrier_ef_spark.query.engine import run_queries

    ql = run_queries_ql(
        small_index, [{"qid": 1, "query": "+def +import"}], k=10
    )
    manual = run_queries(
        small_index,
        [{"qid": 1, "terms": ["def", "import"], "mode": "conjunctive"}],
        k=10, strategy="term_major",
    )
    assert _rows(ql) == _rows(manual)


def test_ql_partial_require_filters(small_index):
    """'+val def': val must appear, def only scores — identical to a
    manual doc_filter of val's posting docids."""
    from terrier_ef_spark.query.engine import decode_postings, run_queries

    ql = run_queries_ql(small_index, [{"qid": 7, "query": "+val def"}], k=10)
    flt = decode_postings(small_index, ["val"]).select("docid").distinct()
    manual = run_queries(
        small_index,
        [{"qid": 7, "terms": ["val", "def"], "mode": "disjunctive"}],
        k=10, strategy="term_major", doc_filter=flt,
    )
    assert _rows(ql) == _rows(manual)
    # and it differs from the unfiltered query (the constraint bites)
    unfiltered = run_queries(
        small_index,
        [{"qid": 7, "terms": ["val", "def"], "mode": "disjunctive"}],
        k=10, strategy="term_major",
    )
    assert _rows(ql) != _rows(unfiltered)


def test_ql_phrase_constraint(small_index, small_corpus):
    """A quoted phrase scores its terms over phrase-matching docs only."""
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.query.phrase import phrase_hits

    toks = {d: doc_tokens(42, d) for d in range(small_corpus.count())}
    a, b = toks[0][:2]  # an adjacent pair that certainly occurs
    ql = run_queries_ql(
        small_index, [{"qid": 1, "query": f'"{a} {b}"'}], k=10
    )
    flt = phrase_hits(small_index, [a, b]).select("docid")
    manual = run_queries(
        small_index,
        [{"qid": 1, "terms": [a, b], "mode": "disjunctive"}],
        k=10, strategy="term_major", doc_filter=flt,
    )
    assert _rows(ql) == _rows(manual)
    assert _rows(ql)  # non-empty by fixture construction


def test_ql_negated_phrase_excludes(small_index, small_corpus):
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.query.phrase import phrase_hits

    toks = {d: doc_tokens(42, d) for d in range(small_corpus.count())}
    a, b = toks[0][:2]
    ql = run_queries_ql(
        small_index, [{"qid": 2, "query": f'def -"{a} {b}"'}], k=400
    )
    banned = {
        r["docid"] for r in phrase_hits(small_index, [a, b]).collect()
    }
    got_docs = {r[2] for r in _rows(ql)}
    assert banned and not (got_docs & banned)


def test_ql_window_equals_proximity_for_two_terms(small_index, small_corpus):
    """'"a b"~W' (span window) == proximity_match membership for 2 terms."""
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.query.phrase import proximity_match, window_hits

    n = small_corpus.count()
    toks = {d: doc_tokens(42, d) for d in range(n)}
    a, b = toks[0][0], toks[0][4]
    assert a != b
    win = window_hits(small_index, [a, b], 5)
    prox = proximity_match(small_index, a, b, window=5, k=n)
    assert {r["docid"] for r in win.collect()} == {
        r["docid"] for r in prox.collect()
    }


def test_window_hits_vs_bruteforce(small_index, small_corpus):
    """3-term unordered window membership vs a pure-Python oracle."""
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.query.phrase import window_hits

    n = small_corpus.count()
    toks = {d: doc_tokens(42, d) for d in range(n)}
    terms, win = ["def", "import", "return"], 6

    def match(ts):
        pos = [i for i, t in enumerate(ts) if t in terms]
        for i in pos:
            seen = {ts[j] for j in pos if i <= j <= i + win}
            if len(seen) == 3:
                return True
        return False

    expected = {d for d, ts in toks.items() if match(ts)}
    got = {r["docid"] for r in window_hits(small_index, terms, win).collect()}
    assert got == expected and expected


def test_ql_prefix_identity(small_index):
    from terrier_ef_spark.query.expansion import run_queries_prefix

    ql = run_queries_ql(small_index, [{"qid": 1, "query": "v1*"}], k=10)
    manual = run_queries_prefix(
        small_index, [{"qid": 1, "prefix": "v1"}], k=10
    )
    assert _rows(ql) == _rows(manual) and _rows(ql)


def test_ql_fuzzy_identity(small_index):
    from terrier_ef_spark.query.expansion import run_queries_fuzzy

    ql = run_queries_ql(small_index, [{"qid": 1, "query": "vall~"}], k=10)
    manual = run_queries_fuzzy(small_index, [{"qid": 1, "term": "vall"}], k=10)
    assert _rows(ql) == _rows(manual) and _rows(ql)


def test_ql_mixed_batch_and_oov(small_index):
    """A batch mixing unconstrained + constrained + OOV topics: the OOV
    topic contributes no rows, the others answer independently."""
    from terrier_ef_spark.query.engine import run_queries

    ql = run_queries_ql(
        small_index,
        [
            {"qid": 1, "query": "def import"},
            {"qid": 2, "query": "+val def"},
            {"qid": 3, "query": "zzzznotaterm"},
        ],
        k=5,
    )
    rows = _rows(ql)
    by_qid = {q: [r for r in rows if r[0] == q] for q in (1, 2, 3)}
    base = run_queries(
        small_index,
        [{"qid": 1, "terms": ["def", "import"], "mode": "disjunctive"}],
        k=5, strategy="term_major",
    )
    assert by_qid[1] == _rows(base)
    assert by_qid[2]  # constrained topic answered
    assert by_qid[3] == []  # OOV: no rows, no error


def test_ql_duplicate_qids_rejected(small_index):
    with pytest.raises(ValueError, match="duplicate qids"):
        run_queries_ql(
            small_index,
            [{"qid": 1, "query": "def"}, {"qid": 1, "query": "val"}],
            k=5,
        )


def test_compile_drops_pipeline_casualties(small_index):
    """Uppercase folds; a '+' on a term the pipeline keeps is retained
    with the constraint; weights aggregate across occurrences."""
    cq = compile_query(small_index, 9, "+DEF def import^3")
    assert cq.terms == ["def", "import"]
    assert cq.weights == {"def": 2.0, "import": 3.0}
    assert cq.require_terms == ["def"]
    assert not cq.phrases and not cq.not_terms


# ---------------------------------------------------------------------------
# synonym groups: {a b} merged-posting-list semantics
# ---------------------------------------------------------------------------

def test_parse_groups():
    got = parse_query('{taxi cab} +{a b}^2 -{x y} {solo}')
    assert got == [
        QLClause("group", ("taxi", "cab")),
        QLClause("group", ("a", "b"), "+", 2.0),
        QLClause("group", ("x", "y"), "-"),
        QLClause("term", ("solo",)),
    ]


@pytest.mark.parametrize("bad", ["{", "{}", "{a", "-{a b}^2", "{ }"])
def test_parse_group_rejects(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def _oracle_ql_groups(oracle, units, k, k1=1.2, b=0.75):
    """Brute-force scorer: units = [(member_terms, weight)]; each unit
    scores over its MERGED posting list (tf summed per doc, df = docs
    containing any member)."""
    import math
    from collections import defaultdict

    scores = defaultdict(float)
    for members, w in units:
        merged = defaultdict(int)
        for t in members:
            for d, tf in oracle.postings.get(t, []):
                merged[d] += tf
        if not merged:
            continue
        df = len(merged)
        idf = math.log2((oracle.num_docs - df + 0.5) / (df + 0.5))
        for d, tf in merged.items():
            dl = oracle.doclen[d]
            scores[d] += w * idf * tf * (k1 + 1) / (
                k1 * (1 - b + b * dl / oracle.avgdl) + tf
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s) for d, s in ranked]


def test_ql_group_vs_bruteforce(small_index, small_oracle):
    got = run_queries_ql(
        small_index, [{"qid": 1, "query": "{val len} def"}], k=10
    ).orderBy("rank").collect()
    want = _oracle_ql_groups(
        small_oracle, [(("val", "len"), 1.0), (("def",), 1.0)], k=10
    )
    assert [r["docid"] for r in got] == [d for d, _ in want]
    assert all(
        abs(r["score"] - s) < 1e-9 for r, (_, s) in zip(got, want)
    )


def test_ql_group_boost_scales(small_index, small_oracle):
    got = run_queries_ql(
        small_index, [{"qid": 1, "query": "{val len}^2 def"}], k=10
    ).orderBy("rank").collect()
    want = _oracle_ql_groups(
        small_oracle, [(("val", "len"), 2.0), (("def",), 1.0)], k=10
    )
    assert [r["docid"] for r in got] == [d for d, _ in want]
    assert all(
        abs(r["score"] - s) < 1e-9 for r, (_, s) in zip(got, want)
    )


def test_ql_group_collapse_equals_plain_term(small_index):
    """A group whose members collapse to one term in the pipeline
    scores exactly like the plain term query (same engine path)."""
    a = run_queries_ql(small_index, [{"qid": 1, "query": "{def DEF}"}], k=10)
    b = run_queries_ql(small_index, [{"qid": 1, "query": "def"}], k=10)
    assert _rows(a) == _rows(b)


def test_ql_negated_group_equals_not_terms(small_index):
    a = run_queries_ql(
        small_index, [{"qid": 1, "query": "def -{val len}"}], k=10
    )
    b = run_queries_ql(
        small_index, [{"qid": 1, "query": "def -val -len"}], k=10
    )
    assert _rows(a) == _rows(b) and _rows(a)


def test_ql_required_group_constrains(small_index, small_oracle):
    """'+{val len} def': scored like the bare group query but
    restricted to docs containing val or len."""
    got = run_queries_ql(
        small_index, [{"qid": 1, "query": "+{val len} def"}], k=400
    ).collect()
    allowed = {d for t in ("val", "len")
               for d, _ in small_oracle.postings.get(t, [])}
    got_docs = {r["docid"] for r in got}
    assert got_docs and got_docs <= allowed
    # and every returned (docid, score) matches the unconstrained group
    # query's score for that doc (the constraint filters, never rescores)
    unconstrained = {
        r["docid"]: r["score"]
        for r in run_queries_ql(
            small_index, [{"qid": 1, "query": "{val len} def"}], k=400
        ).collect()
    }
    assert all(
        abs(unconstrained[r["docid"]] - r["score"]) < 1e-9 for r in got
    )


def test_ql_group_mixed_batch(small_index):
    """Group topics coexist with simple and constrained topics in one
    batch; per-qid results equal their solo runs."""
    batch = run_queries_ql(
        small_index,
        [
            {"qid": 1, "query": "{val len} def"},
            {"qid": 2, "query": "def import"},
            {"qid": 3, "query": "+val def"},
        ],
        k=5,
    )
    rows = _rows(batch)
    for qid, text in ((1, "{val len} def"), (2, "def import"),
                      (3, "+val def")):
        solo = run_queries_ql(
            small_index, [{"qid": qid, "query": text}], k=5
        )
        assert [r for r in rows if r[0] == qid] == _rows(solo)
