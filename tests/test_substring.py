"""Trigram-index substring / regex search (query/substring.py) — the
Zoekt / Google-Code-Search role over the EF posting machinery."""

from __future__ import annotations

import re

import pytest

from terrier_ef_spark.query.substring import (
    regex_required_literals,
    required_trigrams,
)


def test_required_trigrams():
    assert required_trigrams("abcde", case_fold=False) == [
        "abc",
        "bcd",
        "cde",
    ]
    assert required_trigrams("AbC") == ["abc"]  # folded by default
    assert required_trigrams("AbC", case_fold=False) == ["AbC"]
    assert required_trigrams("ab") == []  # too short for the index
    assert required_trigrams("aaaa") == ["aaa"]  # distinct


def test_regex_required_literals():
    f = regex_required_literals
    assert f(r"plain literal") == ["plain literal"]
    # classes / wildcards split runs; both sides >=3 chars are required
    assert f(r"fast [a-z]+ merge") == [" merge", "fast "]
    assert f(r"^key agg.*value") == ["key agg", "value"]
    # alternation proves nothing
    assert f(r"(table|window) scan") == [" scan"]
    assert f(r"foo|bar") == []
    # optional content proves nothing, min>=1 repeats prove one copy
    assert f(r"val(ue)? table") == [" table", "val"]
    assert f(r"(?:sort)+ table") == [" table", "sort"]
    assert f(r"(?:sort)* table") == [" table"]
    # group bodies are required
    assert f(r"(key agg)") == ["key agg"]
    # short fragments (<3 chars) are dropped
    assert f(r"ab.cd") == []


@pytest.fixture(scope="module")
def tri_setup(spark, tmp_path_factory):
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.query.substring import build_trigram_index

    corpus = synthesize_corpus(spark, 120, seed=7, n_partitions=4)
    texts = {
        r.doc_id: r.content
        for r in corpus.select("doc_id", "content").collect()
    }
    out = str(tmp_path_factory.mktemp("tri") / "idx")
    idx = build_trigram_index(spark, corpus, out, n_partitions=4)
    return idx, corpus, texts


def _sub_oracle(texts, pats, fold=False):
    if fold:
        return {
            (q, d)
            for q, p in pats
            for d, t in texts.items()
            if p.lower() in t.lower()
        }
    return {(q, d) for q, p in pats for d, t in texts.items() if p in t}


def test_substring_exact(tri_setup):
    from terrier_ef_spark.query.substring import substring_search

    idx, corpus, texts = tri_setup
    pats = [
        (1, "fast merge"),
        (2, "the"),
        (3, "zzqx-not-present"),
        (4, "ta"),  # <3 chars: verification-scan fallback
        (5, "w t"),  # crosses word boundaries
    ]
    got = {
        (r.qid, r.doc_id)
        for r in substring_search(idx, corpus, pats).collect()
    }
    want = _sub_oracle(texts, pats)
    assert got == want and any(q == 4 for q, _ in got)


def test_substring_rarest_k_cap_stays_exact(tri_setup):
    """Decoding only the k rarest trigrams yields a candidate superset;
    verification restores exactness — assert at an aggressive cap."""
    from terrier_ef_spark.query.substring import substring_search

    idx, corpus, texts = tri_setup
    pats = [(1, "fast merge batch"), (2, "table value part")]
    got = {
        (r.qid, r.doc_id)
        for r in substring_search(
            idx, corpus, pats, max_trigrams=2
        ).collect()
    }
    assert got == _sub_oracle(texts, pats)


def test_substring_absent_trigram_short_circuits(tri_setup):
    """A pattern with an out-of-vocabulary trigram is finished at the
    lexicon probe — no decode, no rows."""
    from terrier_ef_spark.query.substring import substring_search

    idx, corpus, _ = tri_setup
    res = substring_search(idx, corpus, [(9, "merge Qx7 batch")])
    assert res.count() == 0


def test_substring_case_modes(spark, tmp_path_factory):
    from terrier_ef_spark.query.substring import (
        build_trigram_index,
        substring_search,
    )

    corpus = spark.createDataFrame(
        [
            ("r", "0", "c", "py", "Alpha FooBar calls fooBar()", 0),
            ("r", "1", "c", "py", "lower foobar only", 1),
            ("r", "2", "c", "py", "no match here", 2),
        ],
        "repo string, path string, commit string, lang string, "
        "content string, doc_id long",
    )
    texts = {r.doc_id: r.content for r in corpus.collect()}
    out = str(tmp_path_factory.mktemp("tri_case") / "idx")
    idx = build_trigram_index(spark, corpus, out, n_partitions=2)

    pats = [(1, "FooBar"), (2, "foobar")]
    # case-sensitive over the folded index: verification disambiguates
    got = {
        (r.qid, r.doc_id)
        for r in substring_search(idx, corpus, pats).collect()
    }
    assert got == _sub_oracle(texts, pats) == {(1, 0), (2, 1)}
    # case-insensitive: folded trigrams + folded verification
    got = {
        (r.qid, r.doc_id)
        for r in substring_search(
            idx, corpus, pats, case_sensitive=False
        ).collect()
    }
    assert got == _sub_oracle(texts, pats, fold=True)
    assert got == {(1, 0), (1, 1), (2, 0), (2, 1)}


def test_regex_exact(tri_setup):
    from terrier_ef_spark.query.substring import regex_search

    idx, corpus, texts = tri_setup
    pats = [
        (1, r"fast [a-z]+ merge"),
        (2, r"(key|part) agg"),  # alternation: ' agg' is the literal
        (3, r"table{1,2} (scan|sort)"),
        (4, r"value .{0,6} merge"),
        (5, r"^the"),  # anchor + 3-char literal
    ]
    got = {
        (r.qid, r.doc_id) for r in regex_search(idx, corpus, pats).collect()
    }
    want = {
        (q, d)
        for q, p in pats
        for d, t in texts.items()
        if re.search(p, t)
    }
    assert got == want and len(want) > 0


def test_regex_no_literal_falls_back_to_scan(tri_setup):
    from terrier_ef_spark.query.substring import regex_search

    idx, corpus, texts = tri_setup
    pats = [(1, r"(the|zzqx)")]  # no >=3-char REQUIRED literal
    got = {
        (r.qid, r.doc_id) for r in regex_search(idx, corpus, pats).collect()
    }
    want = {
        (1, d) for d, t in texts.items() if re.search(pats[0][1], t)
    }
    assert got == want and len(want) > 0


def test_substring_respects_tombstones(spark, tri_setup, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index  # noqa: F401
    from terrier_ef_spark.index.maintenance import delete_docs
    from terrier_ef_spark.index.reader import EFIndex
    from terrier_ef_spark.query.substring import (
        build_trigram_index,
        substring_search,
    )
    from terrier_ef_spark.corpus import synthesize_corpus

    corpus = synthesize_corpus(spark, 40, seed=7, n_partitions=2)
    texts = {
        r.doc_id: r.content
        for r in corpus.select("doc_id", "content").collect()
    }
    out = str(tmp_path_factory.mktemp("tri_del") / "idx")
    build_trigram_index(spark, corpus, out, n_partitions=2)
    pats = [(1, "the")]
    all_hits = sorted(d for d, t in texts.items() if "the" in t)
    assert len(all_hits) >= 2
    delete_docs(EFIndex(spark, out), [all_hits[0]])
    idx = EFIndex(spark, out)
    got = sorted(
        r.doc_id for r in substring_search(idx, corpus, pats).collect()
    )
    assert got == all_hits[1:]


def test_substring_match_stats(tri_setup):
    """grep -c + first-offset: non-overlapping count (the
    replace-shrinkage identity == Python str.count) and 1-based
    POSITION, verified against a pure-Python oracle; only matching
    docs report."""
    from terrier_ef_spark.query.substring import substring_match_stats

    idx, corpus, texts = tri_setup
    pats = [
        (1, "table"),  # high-frequency: exercises n_matches > 1
        (2, "fast merge"),
        (3, "zzqx-not-present"),
        (4, "ta"),  # <3 chars: verification-scan fallback
    ]
    got = {
        (r.qid, r.doc_id): (r.n_matches, r.first_pos)
        for r in substring_match_stats(idx, corpus, pats).collect()
    }
    want = {}
    for q, p in pats:
        for d, t in texts.items():
            n = t.count(p)
            if n:
                want[(q, d)] = (n, t.index(p) + 1)
    assert got == want
    assert max(n for n, _ in want.values()) >= 2  # counts, not booleans
    assert any(q == 4 for q, _ in want)  # fallback path exercised


def test_grep_lines(spark, tmp_path_factory):
    """Zoekt's matched-line output over a multi-line corpus: exact
    (qid, doc, line_no, line) sets vs a Python oracle, 0-based
    numbering, cross-line patterns yield nothing, case modes."""
    from terrier_ef_spark.query.substring import (
        build_trigram_index,
        grep_lines,
    )

    docs = [
        (0, "def alpha():\n    return beta\n# alpha comment"),
        (1, "class Beta:\n    alpha = 1\n\nbeta = alpha"),
        (2, "nothing relevant\nhere at all"),
    ]
    corpus = spark.createDataFrame(
        [("r", str(i), "c", "py", t, i) for i, t in docs],
        "repo string, path string, commit string, lang string, "
        "content string, doc_id long",
    )
    out = str(tmp_path_factory.mktemp("tri_lines") / "idx")
    idx = build_trigram_index(spark, corpus, out, n_partitions=2)

    pats = [(1, "alpha"), (2, "return beta"), (3, "Beta"), (4, "at")]
    got = {
        (r.qid, r.doc_id, r.line_no, r.line)
        for r in grep_lines(idx, corpus, pats).collect()
    }
    want = set()
    for q, p in pats:
        for d, t in docs:
            for i, ln in enumerate(t.split("\n")):
                if p in ln:
                    want.add((q, d, i, ln))
    assert got == want and len(want) > 0
    assert any(q == 3 and ln == "class Beta:" for q, _, _, ln in got)

    # a pattern containing the separator can never match a single line
    assert grep_lines(idx, corpus, [(9, "beta\n# alpha")]).count() == 0

    # case-insensitive over the folded index
    got_ci = {
        (r.qid, r.doc_id, r.line_no)
        for r in grep_lines(
            idx, corpus, [(1, "BETA")], case_sensitive=False
        ).collect()
    }
    assert got_ci == {(1, 0, 1), (1, 1, 0), (1, 1, 3)}


def test_trigram_index_fsck_clean(tri_setup):
    """The trigram index is a standard EF index, so the integrity fsck
    must hold on it unchanged: tf == 1 per (doc, trigram) by the
    distinct tokenizer, doclen == the doc's distinct-trigram count, and
    every blob/lexicon/stats invariant as for word indexes."""
    from terrier_ef_spark.index.verify import verify_index

    idx, _, _ = tri_setup
    rep = verify_index(idx)
    assert rep["ok"], rep


def test_substring_search_metadata_scoped(tri_setup):
    """Zoekt's lang:/repo: scoping is the corpus argument: a
    pre-filtered corpus restricts results exactly — index-side
    candidates outside the scope drop at the verification join, and
    the fallback scan never reads out-of-scope rows."""
    import pyspark.sql.functions as F

    from terrier_ef_spark.query.substring import substring_search

    idx, corpus, texts = tri_setup
    langs = {
        r.doc_id: r.lang for r in corpus.select("doc_id", "lang").collect()
    }
    pats = [(1, "the"), (2, "ta")]  # indexed + fallback path
    scoped = corpus.where(F.col("lang") == "py")
    got = {
        (r.qid, r.doc_id)
        for r in substring_search(idx, scoped, pats).collect()
    }
    want = {
        (q, d)
        for q, p in pats
        for d, t in texts.items()
        if p in t and langs[d] == "py"
    }
    assert got == want and len(want) > 0
    # and strictly fewer than the unscoped result
    assert len(want) < len(_sub_oracle(texts, pats))


def test_substring_search_plan_shape(spark, tri_setup):
    """Plan regression guard for the trigram pipeline: exactly ONE
    shuffle exchange (the conjunctive groupBy(qid, docid)); the
    pattern/requirement relations and the candidate side of the
    content verification join all broadcast (no sort-merge join); and
    the selected trigrams reach the postings scan as a pushed In
    filter. Losing any of these re-adds corpus-scale shuffles to a
    path whose whole point is candidate-bounded work."""
    import re as _re

    from terrier_ef_spark.query.substring import substring_search

    idx, corpus, _ = tri_setup
    df = substring_search(
        idx, corpus, [(1, "fast merge"), (2, "the import")]
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # exactly one shuffle exchange NODE (formatted mode lists each
    # node twice: once in the tree, once in the detail section)
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert _re.search(r"PushedFilters: \[In\(term", plan), plan[:3000]


def test_word_query_against_trigram_index_named_error(tri_setup):
    """Scoring word topics against a trigram index would silently
    return garbage (word terms vs a trigram lexicon); the recorded
    pipeline refuses with a pointer at the grep door instead."""
    from terrier_ef_spark.tokenizer import tokenize_query

    idx, _, _ = tri_setup
    with pytest.raises(ValueError, match="trigram"):
        tokenize_query(idx, "fast merge")
