"""Term-pipeline options (stopwords, max term length) — the role of
Terrier's configurable termpipelines (EFSetupTest.java:106-107,
stopword-list.txt) and MAX_TERM_LENGTH (util/IndexUtil.java:34)."""

from __future__ import annotations


def test_stopwords_removed_from_index(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_postings

    stop = ["the", "import", "def"]
    idx = build_index(
        spark, tiny_corpus, str(tmp_path / "idx"),
        stopwords=stop, n_partitions=4,
    )
    terms = {r["term"] for r in idx.lexicon.select("term").collect()}
    assert not terms & set(stop)

    # postings match the python-side oracle with the same pipeline
    expected = {}
    for d in range(22):
        for t in doc_tokens(42, d):
            if t not in stop:
                expected[(t, d)] = expected.get((t, d), 0) + 1
    got = {
        (r["term"], r["docid"]): r["tf"]
        for r in decode_postings(idx).collect()
    }
    assert got == expected

    # doclens count only surviving tokens
    doclens = {r["docid"]: r["doclen"] for r in idx.docs.collect()}
    for d in range(22):
        assert doclens[d] == len([t for t in doc_tokens(42, d) if t not in stop])


def test_max_term_length_truncates(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.index.builder import build_index

    idx = build_index(
        spark, tiny_corpus, str(tmp_path / "idx"),
        max_term_length=3, n_partitions=4,
    )
    terms = {r["term"] for r in idx.lexicon.select("term").collect()}
    assert terms and all(len(t) <= 3 for t in terms)
    expected_terms = {t[:3] for d in range(22) for t in doc_tokens(42, d)}
    assert terms == expected_terms


def test_pipeline_change_invalidates_resume(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.index.builder import build_index

    out = str(tmp_path / "idx")
    i1 = build_index(spark, tiny_corpus, out, n_partitions=4)
    n1 = i1.stats["num_terms"]
    i2 = build_index(spark, tiny_corpus, out, stopwords=["the"], n_partitions=4)
    assert i2.stats["num_terms"] == n1 - 1


def test_terrier_preset_end_to_end(spark, tmp_path):
    """The packaged reference-parity pipeline (`tokenizer="terrier"` =
    simple tokenize + the 733-word Terrier stopword list + Porter,
    the reference's `Stopwords,PorterStemmer`, EFSetupTest.java:106-107)
    through a full 2k-doc build: lexicon/postings equal the hand-stemmed
    Python oracle, and BM25 top-10 is rank-identical to a NumPy scorer
    over the oracle postings."""
    import re
    from collections import Counter

    import numpy as np

    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_postings, run_queries
    from terrier_ef_spark.stemmer import porter_stem
    from terrier_ef_spark.stopwords import TERRIER_STOPWORDS

    content_words = [
        "running", "runner", "tables", "table", "adjustment", "hopping",
        "relational", "connection", "connected", "operators", "happiness",
        "nationally", "generalization", "caresses", "ponies", "agreed",
    ]
    stop_sample = ["the", "and", "of", "to", "a", "in", "is", "it", "was", "on"]
    vocab = content_words + stop_sample
    texts = []
    for d in range(2000):
        toks = [vocab[(d * 7 + j * 13 + (d * j) % 5) % len(vocab)] for j in range(20)]
        texts.append(" ".join(toks))
    corpus = spark.createDataFrame(
        [("r", f"f{d:05d}", "c" * 40, "txt", t, d) for d, t in enumerate(texts)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "terrier"), tokenizer="terrier",
        n_partitions=4,
    )

    stopset = set(TERRIER_STOPWORDS)
    oracle_post: dict[tuple[str, int], int] = Counter()
    doclen = np.zeros(2000)
    for d, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        stems = [porter_stem(w) for w in toks if w not in stopset]
        doclen[d] = len(stems)
        for s in stems:
            oracle_post[(s, d)] += 1
    assert any(w in stopset for w in stop_sample)  # fixture exercises the list

    got = {
        (r["term"], r["docid"]): r["tf"] for r in decode_postings(idx).collect()
    }
    assert got == dict(oracle_post)
    lex = {r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()}
    want_df, want_cf = Counter(), Counter()
    for (s, d), tf in oracle_post.items():
        want_df[s] += 1
        want_cf[s] += tf
    assert lex == {s: (want_df[s], want_cf[s]) for s in want_df}

    # rank identity: query-side pipeline = same stop+stem function
    raw_q = ["running", "the", "connection"]
    q_terms = [porter_stem(w) for w in raw_q if w not in stopset]
    res = run_queries(
        idx, [{"qid": 1, "terms": q_terms}], k=10, strategy="term_major"
    ).orderBy("rank").collect()
    n, avgdl = 2000.0, float(doclen.mean())
    scores = np.zeros(2000)
    for s in set(q_terms):
        df = want_df[s]
        idf = np.log2((n - df + 0.5) / (df + 0.5))
        for d in range(2000):
            tf = oracle_post.get((s, d), 0)
            if tf:
                scores[d] += idf * tf * 2.2 / (
                    1.2 * (0.25 + 0.75 * doclen[d] / avgdl) + tf
                )
    order = np.lexsort((np.arange(2000), -np.round(scores, 9)))[:10]
    assert [r.docid for r in res] == order.tolist()
    got_scores = np.array([r.score for r in res])
    assert np.allclose(got_scores, scores[order], rtol=1e-9)


def test_tokenize_query_weighted_counts_qtf(small_index):
    """Repeated query terms carry qtf weight (Terrier's matching sums
    per-occurrence weights, MatchingQueryTerms) — round-4 ADVICE: the
    dedup-only tokenize_query dropped this."""
    from terrier_ef_spark.tokenizer import tokenize_query, tokenize_query_weighted

    terms, weights = tokenize_query_weighted(
        small_index, "import import the import"
    )
    assert terms == tokenize_query(small_index, "import import the import")
    assert weights == {"import": 3.0}

    # weight-1 terms are omitted (run_queries defaults them to 1.0)
    terms, weights = tokenize_query_weighted(small_index, "import the")
    assert weights == {}


def test_qtf_weight_changes_ranking_like_explicit_weights(small_index):
    """End-to-end: a repeated-term query scores identically to the same
    query with an explicit term^w weight."""
    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.tokenizer import tokenize_query_weighted

    terms, weights = tokenize_query_weighted(small_index, "import import zq")
    got = run_queries(
        small_index,
        [{"qid": 1, "terms": terms, "weights": weights or None}],
        k=5,
    ).collect()
    want = run_queries(
        small_index,
        [{"qid": 1, "terms": ["import", "zq"], "weights": {"import": 2.0}}],
        k=5,
    ).collect()
    assert [(r["docid"], round(r["score"], 9)) for r in got] == [
        (r["docid"], round(r["score"], 9)) for r in want
    ]


def test_code_tokenizer_twin_formulations_agree():
    """The DuckDB twin re-expresses the lookaround camel boundaries as
    RE2 capture-group replacements; both formulations must split every
    adversarial identifier identically."""
    import re

    import duckdb

    from terrier_ef_spark.tokenizer import (
        _CAMEL_RE,
        TOKEN_SPLIT_RE,
        tokenize_code_sql_duckdb,
    )

    cases = [
        "getUserName", "HTTPServer2", "parseJSONFile123",
        "snake_case_id", "AAAa", "aXbYc", "XMLHttpRequest",
        "simpleword", "ABcDEf", "mixedCASEToken", "a1A2b", "",
        "IOError", "getX", "loadConfigV7",
    ]
    con = duckdb.connect()
    for c in cases:
        want = [
            t for t in re.split(
                TOKEN_SPLIT_RE, re.sub(_CAMEL_RE, " ", c).lower()
            ) if t
        ]
        got = con.execute(
            f"SELECT {tokenize_code_sql_duckdb('?')}", [c]
        ).fetchone()[0]
        assert got == want, c
