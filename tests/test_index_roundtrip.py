"""End-to-end differential tests: EF index vs uncompressed oracle
(mirrors IndexReadingTest / EFLexiconIteratorTest / EFDocumentIndexTest /
BlockIndexReadingTest, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark import ef


def collect_decoded(index):
    from terrier_ef_spark.query.engine import decode_postings

    pdf = decode_postings(index).toPandas()
    out = {}
    for term, grp in pdf.groupby("term"):
        g = grp.sort_values("docid")
        out[term] = (g["docid"].tolist(), g["tf"].tolist())
    return out


def test_full_decode_equality(small_index, small_oracle):
    """Every term, every posting: docid + tf (IndexReadingTest:89-118)."""
    decoded = collect_decoded(small_index)
    assert set(decoded) == set(small_oracle.postings)
    for term, plist in small_oracle.postings.items():
        docids = [d for d, _ in plist]
        tfs = [tf for _, tf in plist]
        assert decoded[term] == (docids, tfs), term


def test_lexicon_statistics(small_index, small_oracle):
    """Lexicon streams pairwise equal: term, df, cf, maxtf, aligned
    termids (EFLexiconIteratorTest.java:37-67)."""
    lex = small_index.lexicon.orderBy("term").toPandas()
    terms = sorted(small_oracle.postings)
    assert lex["term"].tolist() == terms
    assert lex["termid"].tolist() == list(range(len(terms)))  # aligned
    for r in lex.itertuples(index=False):
        assert r.df == small_oracle.df(r.term)
        assert r.cf == small_oracle.cf(r.term)
        assert r.maxtf == small_oracle.maxtf(r.term)


def test_document_index(small_index, small_oracle):
    """Doc lengths + stats equal (EFDocumentIndexTest.java:38-84)."""
    docs = small_index.docs.orderBy("docid").toPandas()
    assert docs["docid"].tolist() == list(range(small_oracle.num_docs))
    assert docs["doclen"].tolist() == [
        small_oracle.doclen[d] for d in range(small_oracle.num_docs)
    ]
    st = small_index.stats
    assert st["num_docs"] == small_oracle.num_docs
    assert st["num_tokens"] == small_oracle.num_tokens
    assert st["num_terms"] == len(small_oracle.postings)
    assert st["num_postings"] == sum(
        len(p) for p in small_oracle.postings.values()
    )


def test_skip_to_every_k(small_index, small_oracle):
    """next(target) on every k-th docid and docid+1, k in {2,3,4}
    (IndexReadingTest nextIntoEverySkip/nextAfterEverySkip :120-214)."""
    rows = small_index.postings.toPandas()
    n_docs = small_index.stats["num_docs"]
    log2q = small_index.stats["log2_quantum"]
    for r in rows.itertuples(index=False):
        plist = small_oracle.postings[r.term]
        docids = [d for d, _ in plist]
        for k in (2, 3, 4):
            cur = ef.DocidCursor(bytes(r.docids_ef), int(r.df), n_docs, log2q)
            for target in docids[::k]:
                assert cur.next_geq(target) == target
            cur = ef.DocidCursor(bytes(r.docids_ef), int(r.df), n_docs, log2q)
            for target in docids[::k]:
                got = cur.next_geq(target + 1)
                nxt = [d for d in docids if d >= target + 1]
                assert got == (nxt[0] if nxt else -1)


def test_positions_roundtrip(small_index, small_oracle):
    """Positions arrays equal, incl. repeated decode
    (BlockIndexReadingTest.java:95-198)."""
    rows = small_index.postings.toPandas().to_dict("records")
    for r in rows:
        decoded = small_index.decode_block_positions(r)
        docids = small_index.decode_block_docids(r)
        for d, ps in zip(docids, decoded):
            assert ps.tolist() == small_oracle.positions[r["term"]][int(d)]
        # repeated read must be identical (lazy/repeat semantics)
        again = small_index.decode_block_positions(r)
        assert all(np.array_equal(a, b) for a, b in zip(decoded, again))


def test_sha256_invariant(spark, small_index, small_corpus):
    """content sha256 per-row invariant through the pipeline (input_hint)."""
    from pyspark.sql import functions as F

    expected = {
        r["doc_id"]: r["h"]
        for r in small_corpus.select(
            "doc_id", F.sha2("content", 256).alias("h")
        ).collect()
    }
    got = {
        r["docid"]: r["sha256"] for r in small_index.docs.collect()
    }
    assert got == expected


def test_build_determinism_across_parallelism(spark, tmp_path):
    """Index content identical at different parallelism (mirrors the
    parallelism {1,2,3} grid + MD5 identity, EFDirectIndexTest:83-101)."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index

    outs = []
    for nparts, tag in ((2, "p2"), (8, "p8")):
        corpus = synthesize_corpus(spark, 120, seed=7, n_partitions=nparts)
        idx = build_index(
            spark, corpus, str(tmp_path / tag), log2_quantum=3, n_partitions=4
        )
        pdf = idx.postings.orderBy("term", "block_id").toPandas()
        outs.append(
            [
                (r.term, int(r.block_id), bytes(r.docids_ef), bytes(r.freqs_ef))
                for r in pdf.itertuples(index=False)
            ]
        )
    assert outs[0] == outs[1]


def test_multiblock_build_matches_single(spark, tmp_path):
    """Blocked (salted) build decodes to the same postings as the
    single-block build — the hot-key path is lossless."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_postings

    corpus = synthesize_corpus(spark, 200, seed=11, n_partitions=4)
    single = build_index(spark, corpus, str(tmp_path / "single"), n_partitions=4)
    blocked = build_index(
        spark, corpus, str(tmp_path / "blocked"), block_bits=5, n_partitions=4
    )
    a = decode_postings(single).orderBy("term", "docid").toPandas()
    b = decode_postings(blocked).orderBy("term", "docid").toPandas()
    assert a.equals(b)
    assert blocked.postings.where("block_id > 0").count() > 0  # actually split


def test_build_leaves_no_cached_blocks(spark, tmp_path):
    """build_index releases every intermediate it persists (incl. the
    assign_dense_ids range-partitioned input — VERDICT r02 wrong #4):
    the session's persistent-RDD set gains nothing across a build."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    corpus = synthesize_corpus(spark, 100, seed=5, n_partitions=4)
    build_index(spark, corpus, str(tmp_path / "leak"), n_partitions=4)
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), sorted(after - before)
