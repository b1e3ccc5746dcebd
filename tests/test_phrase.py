"""Exact-phrase matching over the positional (block) index, checked
against a pure-Python sliding-window oracle on the same token streams
(the differential pattern of BlockIndexReadingTest:95-198, extended to
the phrase semantics the block index exists to serve)."""

from __future__ import annotations

from collections import defaultdict


def _oracle_phrase(tokens_by_doc: dict[int, list[str]], phrase: list[str]):
    counts = defaultdict(int)
    n = len(phrase)
    for d, toks in tokens_by_doc.items():
        for i in range(len(toks) - n + 1):
            if toks[i : i + n] == phrase:
                counts[d] += 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def _tokens(small_corpus_n: int):
    from terrier_ef_spark.corpus import doc_tokens

    return {d: doc_tokens(42, d) for d in range(small_corpus_n)}


def test_phrase_match_vs_oracle(spark, small_index, small_corpus):
    from terrier_ef_spark.query.phrase import phrase_match

    toks = _tokens(small_corpus.count())
    # pick a phrase that actually occurs: the two most common adjacent
    # tokens of doc 0
    phrase = toks[0][:2]
    expected = _oracle_phrase(toks, phrase)
    assert expected, "fixture phrase must occur at least once"

    got = phrase_match(small_index, phrase, k=len(expected) + 5).collect()
    got_pairs = [(r["docid"], r["n_occurrences"]) for r in got]
    assert got_pairs == expected
    assert [r["rank"] for r in got] == list(range(1, len(expected) + 1))


def test_phrase_with_duplicate_term(spark, small_index, small_corpus):
    """A phrase containing the same term twice must anchor both indices."""
    from terrier_ef_spark.query.phrase import phrase_match

    toks = _tokens(small_corpus.count())
    # find any adjacent repeated token in the corpus
    phrase = None
    for d, ts in toks.items():
        for i in range(len(ts) - 1):
            if ts[i] == ts[i + 1]:
                phrase = [ts[i], ts[i + 1]]
                break
        if phrase:
            break
    if phrase is None:
        import pytest

        pytest.skip("no adjacent duplicate token in fixture corpus")
    expected = _oracle_phrase(toks, phrase)
    got = phrase_match(small_index, phrase, k=len(expected) + 5).collect()
    assert [(r["docid"], r["n_occurrences"]) for r in got] == expected


def test_phrase_absent(spark, small_index):
    from terrier_ef_spark.query.phrase import phrase_match

    assert phrase_match(small_index, ["zzznope", "alsomissing"], k=10).count() == 0


def test_positions_relation_matches_token_stream(spark, small_index, small_corpus):
    """decode_positions_df emits exactly the (term, docid, pos) triples
    of the original token streams — full positional losslessness."""
    from terrier_ef_spark.query.engine import decode_positions_df

    toks = _tokens(small_corpus.count())
    expected = sorted(
        (t, d, i) for d, ts in toks.items() for i, t in enumerate(ts)
    )
    got = sorted(
        (r["term"], r["docid"], r["pos"])
        for r in decode_positions_df(small_index).collect()
    )
    assert got == expected


def test_phrase_selective_equals_full(small_index):
    """Candidate-selective positions decode yields identical phrase and
    proximity results to whole-list decode, including absent-term and
    duplicate-term phrases."""
    from terrier_ef_spark.query.phrase import phrase_match, proximity_match

    for phrase in (["the", "v150"], ["import", "def"], ["the", "the"],
                   ["the", "zzz_absent_zzz"]):
        full = [tuple(r) for r in phrase_match(
            small_index, phrase, k=20, selective=False).orderBy("rank").collect()]
        sel = [tuple(r) for r in phrase_match(
            small_index, phrase, k=20, selective=True).orderBy("rank").collect()]
        assert sel == full, phrase
    fullp = [tuple(r) for r in proximity_match(
        small_index, "the", "v150", window=5, k=20, selective=False
    ).orderBy("rank").collect()]
    selp = [tuple(r) for r in proximity_match(
        small_index, "the", "v150", window=5, k=20, selective=True
    ).orderBy("rank").collect()]
    assert selp == fullp


def test_decode_positions_selective_matches_filtered_full(small_index, small_oracle):
    """decode_positions_selective == decode_positions_df filtered to the
    candidate (term, docid) pairs."""
    from terrier_ef_spark.query.engine import (
        decode_positions_df,
        decode_positions_selective,
    )

    spark = small_index.spark
    cand_docs = sorted(d for d, _ in small_oracle.postings["v150"])
    cand = spark.createDataFrame(
        [("the", d) for d in cand_docs], "term string, docid long"
    )
    got = sorted(
        (r.term, int(r.docid), int(r.pos))
        for r in decode_positions_selective(small_index, cand, ["the"]).collect()
    )
    want = sorted(
        (r.term, int(r.docid), int(r.pos))
        for r in decode_positions_df(small_index, terms=["the"]).collect()
        if int(r.docid) in set(cand_docs)
    )
    assert got == want and len(got) > 0
