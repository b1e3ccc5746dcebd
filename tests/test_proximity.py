"""Proximity (positional window) queries vs a pure-Python oracle."""

from __future__ import annotations


def _oracle_proximity(tokens_by_doc, a, b, window):
    out = {}
    for d, toks in tokens_by_doc.items():
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        n = sum(1 for x in pa for y in pb if abs(x - y) <= window)
        if n:
            out[d] = n
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_proximity_vs_oracle(spark, small_index, small_corpus):
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.query.phrase import proximity_match

    toks = {d: doc_tokens(42, d) for d in range(small_corpus.count())}
    a, b = toks[0][0], toks[0][1]
    assert a != b
    expected = _oracle_proximity(toks, a, b, 4)
    assert expected
    got = proximity_match(small_index, a, b, window=4, k=len(expected) + 5).collect()
    assert [(r["docid"], r["n_occurrences"]) for r in got] == expected


def test_proximity_rejects_same_term(spark, small_index):
    import pytest

    from terrier_ef_spark.query.phrase import proximity_match

    with pytest.raises(ValueError):
        proximity_match(small_index, "the", "the")


def test_empty_and_single_doc_build(spark, tmp_path):
    """Degenerate corpora build clean indexes (finalize null-agg guard)."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import run_queries

    empty = synthesize_corpus(spark, 0, seed=1, n_partitions=2)
    idx = build_index(spark, empty, str(tmp_path / "e"), n_partitions=2)
    assert idx.stats["num_docs"] == 0 and idx.stats["num_postings"] == 0
    assert run_queries(idx, [{"qid": 1, "terms": ["x"]}], k=5).count() == 0

    one = synthesize_corpus(spark, 1, seed=1, n_partitions=2)
    idx1 = build_index(spark, one, str(tmp_path / "o"), n_partitions=2)
    assert idx1.stats["num_docs"] == 1
    assert run_queries(idx1, [{"qid": 1, "terms": ["the"]}], k=5).count() == 1
