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
