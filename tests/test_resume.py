"""Checkpoint/resume of the index build (north_rule: 'checkpointed
per-partition with lineage and ... resumable mid-build').

The build is staged (docs → postings → lexicon → metrics), each stage
committed to parquet with a _SUCCESS marker; a re-run skips committed
stages unless the build parameters changed (params.json guard)."""

from __future__ import annotations

import json
import os
import shutil


def _mtime(path: str) -> float:
    return os.path.getmtime(os.path.join(path, "_SUCCESS"))


def test_resume_skips_committed_stages(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.index.builder import IndexPaths, build_index
    from terrier_ef_spark.query.engine import decode_postings

    out = str(tmp_path / "idx")
    build_index(spark, tiny_corpus, out, n_partitions=4)
    paths = IndexPaths(out)
    m_docs, m_post = _mtime(paths.docs), _mtime(paths.postings)
    before = decode_postings(
        build_index(spark, tiny_corpus, out, n_partitions=4)
    ).orderBy("term", "docid").toPandas()

    # simulate a mid-build crash: lexicon lost, earlier stages committed
    shutil.rmtree(paths.lexicon)
    idx = build_index(spark, tiny_corpus, out, n_partitions=4)

    # committed stages were NOT recomputed...
    assert _mtime(paths.docs) == m_docs
    assert _mtime(paths.postings) == m_post
    # ...the lost stage was, and the index is whole
    assert os.path.exists(os.path.join(paths.lexicon, "_SUCCESS"))
    after = decode_postings(idx).orderBy("term", "docid").toPandas()
    assert after.equals(before)


def test_param_change_invalidates_stages(spark, tiny_corpus, tmp_path):
    """Stage markers from a build with different parameters must not be
    reused: a changed log2_quantum re-encodes the postings."""
    from terrier_ef_spark.index.builder import IndexPaths, build_index

    out = str(tmp_path / "idx")
    build_index(spark, tiny_corpus, out, log2_quantum=8, n_partitions=4)
    paths = IndexPaths(out)
    m_post = _mtime(paths.postings)

    idx = build_index(spark, tiny_corpus, out, log2_quantum=3, n_partitions=4)
    assert _mtime(paths.postings) != m_post
    assert idx.stats["log2_quantum"] == 3
    assert json.load(open(paths.params))["log2_quantum"] == 3


def test_param_change_crash_window(spark, tiny_corpus, tmp_path):
    """Crash-window regression (ADVICE r01): build A (q=8) completes;
    build B (q=3) writes params.json then crashes BEFORE re-encoding
    postings. A rerun of B must NOT resume A's stale postings — the new
    params write is preceded by stage-marker invalidation."""
    from terrier_ef_spark.index.builder import IndexPaths, _check_resume, build_index

    out = str(tmp_path / "idx")
    build_index(spark, tiny_corpus, out, log2_quantum=8, n_partitions=4)
    paths = IndexPaths(out)

    # simulate build B's params write + immediate crash (no stage work)
    new_params = json.load(open(paths.params))
    new_params["log2_quantum"] = 3
    _check_resume(paths, new_params, resume=True)
    assert not os.path.exists(os.path.join(paths.postings, "_SUCCESS"))

    # rerun of B: params match what's on disk, but stages were
    # invalidated, so the postings are re-encoded with q=3
    idx = build_index(spark, tiny_corpus, out, log2_quantum=3, n_partitions=4)
    assert idx.stats["log2_quantum"] == 3
    row = idx.postings.limit(1).collect()[0]
    assert len(idx.decode_block_docids(row)) == row["df"]  # decodes cleanly


def test_stale_direct_invalidated_by_rebuild(spark, tiny_corpus, tmp_path):
    """A direct index built from an earlier inverted index must not be
    resumed after the inverted index changed (ADVICE r01: stale direct
    decodes with the new num_terms bound -> silent garbage)."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.direct import build_direct, decode_direct

    out = str(tmp_path / "idx")
    half = tiny_corpus.where(F.col("path") < "f5")
    idx1 = build_index(spark, half, out, n_partitions=4)
    build_direct(idx1, n_partitions=2)

    # rebuild the inverted index over the FULL corpus (num_terms changes)
    idx2 = build_index(spark, tiny_corpus, out, n_partitions=4, resume=False)
    direct = build_direct(idx2, n_partitions=2)
    got = decode_direct(idx2, direct).groupBy().agg(
        F.sum("tf").alias("s")
    ).collect()[0]["s"]
    expect = idx2.stats["num_tokens"]
    assert got == expect  # a stale direct would miss the new docs' tokens


def test_resume_false_rebuilds(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.index.builder import IndexPaths, build_index

    out = str(tmp_path / "idx")
    build_index(spark, tiny_corpus, out, n_partitions=4)
    paths = IndexPaths(out)
    m_post = _mtime(paths.postings)
    build_index(spark, tiny_corpus, out, n_partitions=4, resume=False)
    assert _mtime(paths.postings) != m_post
