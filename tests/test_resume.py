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


def test_resume_false_rebuilds(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.index.builder import IndexPaths, build_index

    out = str(tmp_path / "idx")
    build_index(spark, tiny_corpus, out, n_partitions=4)
    paths = IndexPaths(out)
    m_post = _mtime(paths.postings)
    build_index(spark, tiny_corpus, out, n_partitions=4, resume=False)
    assert _mtime(paths.postings) != m_post
