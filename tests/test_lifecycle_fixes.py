"""Tombstone semantics across the lifecycle verbs (round-4 advisory
fixes): merges carry tombstones through relabeled, prune folds them in,
BM25F excludes them, and the delete-set swap is crash-safe."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.maintenance import delete_docs, deletes_path
from terrier_ef_spark.index.merge import merge_indexes, merge_many
from terrier_ef_spark.index.prune import prune_index
from terrier_ef_spark.query.bm25f import run_queries_bm25f
from terrier_ef_spark.query.engine import decode_postings, run_queries

QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "return"], "mode": "disjunctive"},
]


@pytest.fixture(scope="module")
def two_segments(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lifecycle")
    ca = synthesize_corpus(spark, 40, seed=71, n_partitions=2)
    cb = synthesize_corpus(spark, 35, seed=72, n_partitions=2)
    a = build_index(spark, ca, str(root / "a"), block_bits=5, n_partitions=2)
    b = build_index(spark, cb, str(root / "b"), block_bits=5, n_partitions=2)
    return a, b, root


def test_merge_carries_tombstones_relabeled(spark, two_segments):
    """A doc deleted in a source segment stays deleted in the merged
    index, with its docid shifted by the segment's merge offset."""
    a, b, root = two_segments
    delete_docs(a, [3, 9])
    delete_docs(b, [2])
    try:
        m = merge_indexes(spark, a.paths.root, b.paths.root,
                          str(root / "m_tomb"), n_partitions=2)
        # a spans docids 0..39 -> b's offset is the next block boundary, 64
        tomb = {r["docid"] for r in m.deleted_docids().collect()}
        assert tomb == {3, 9, 64 + 2}
        got = {r["docid"] for r in run_queries(m, QUERIES, k=1000).collect()}
        assert not (got & tomb)
    finally:
        shutil.rmtree(deletes_path(a.paths), ignore_errors=True)
        shutil.rmtree(deletes_path(b.paths), ignore_errors=True)


def test_merge_many_clean_segments_has_no_deletes(spark, two_segments):
    a, b, root = two_segments
    m = merge_many(spark, [a.paths.root, b.paths.root],
                   str(root / "m_clean"), n_partitions=2)
    assert m.deleted_docids() is None


def test_prune_folds_tombstones(spark, two_segments):
    """prune(tombstoned idx) serves only live docs: deleted postings
    can't occupy top-n slots, the docs table drops them, and the stats
    are live-set stats (same as prune-after-compact)."""
    a, _, root = two_segments
    deleted = [0, 5, 11]
    delete_docs(a, deleted)
    try:
        p = prune_index(a, str(root / "pruned"), top_n=3, n_partitions=2)
        got_docs = {r["docid"] for r in p.docs.select("docid").collect()}
        assert not (got_docs & set(deleted))
        assert p.stats["num_docs"] == a.stats["num_docs"] - len(deleted)
        post_docs = {r["docid"] for r in decode_postings(p).collect()}
        assert not (post_docs & set(deleted))
        # kept slots were re-awarded to live docs, not burned on deleted
        # ones: every term still has min(df_live, top_n) postings
        live_rows = (
            decode_postings(a)
            .join(a.deleted_docids(), "docid", "left_anti")
            .groupBy("term").agg(F.count(F.lit(1)).alias("df_live"))
        )
        want = {r["term"]: min(r["df_live"], 3) for r in live_rows.collect()}
        got = {
            r["term"]: r["n"]
            for r in decode_postings(p)
            .groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(deletes_path(a.paths), ignore_errors=True)


def test_bm25f_excludes_tombstones(spark, two_segments, tmp_path_factory):
    """A doc tombstoned in any field index is excluded from fielded
    results; idf stays global until compaction."""
    a, _, _ = two_segments
    root = tmp_path_factory.mktemp("bm25f_tomb")
    # second field over the same docid space: rebuild from same corpus
    ca = synthesize_corpus(spark, 40, seed=71, n_partitions=2)
    f2 = build_index(spark, ca, str(root / "f2"), block_bits=5,
                     n_partitions=2)
    fields = {"content": a, "title": f2}
    base = run_queries_bm25f(fields, QUERIES, k=1000).collect()
    top_docid = base[0]["docid"]
    delete_docs(f2, [int(top_docid)])
    try:
        got = run_queries_bm25f(fields, QUERIES, k=1000).collect()
        assert top_docid not in {r["docid"] for r in got}
        # escape hatch reproduces the pre-delete view
        raw = run_queries_bm25f(fields, QUERIES, k=1000,
                                respect_deletes=False).collect()
        assert sorted(map(tuple, raw)) == sorted(map(tuple, base))
    finally:
        shutil.rmtree(deletes_path(f2.paths), ignore_errors=True)


def test_delete_swap_crash_recovery(spark, two_segments):
    """Simulate a crash between rename(final->old) and rename(tmp->final):
    the tombstone set must stay readable (via deletes_old) and the next
    delete_docs must restore + merge rather than start from empty."""
    _, b, _ = two_segments
    delete_docs(b, [1, 4])
    final = deletes_path(b.paths)
    aside = final + "_old"
    try:
        # crash window: old set parked aside, no live deletes dir
        os.rename(final, aside)
        got = {r["docid"] for r in b.deleted_docids().collect()}
        assert got == {1, 4}, "reader must fall back to deletes_old"
        banned = {r["docid"]
                  for r in run_queries(b, QUERIES, k=1000).collect()}
        assert not (banned & {1, 4})
        # next write recovers: restores the parked set, merges new ids
        n = delete_docs(b, [7])
        assert n == 3
        assert not os.path.exists(aside)
        got = {r["docid"] for r in b.deleted_docids().collect()}
        assert got == {1, 4, 7}
    finally:
        shutil.rmtree(aside, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)


def test_tiering_carries_tombstones(spark, tmp_path_factory):
    """compact_segments is merge_many underneath: a doc tombstoned in
    any input segment must stay deleted through the whole merge tree
    (multi-level, so tombstones relabel through intermediate merges)."""
    from terrier_ef_spark.index.tiering import compact_segments

    root = tmp_path_factory.mktemp("tier_tomb")
    idxs = []
    for i in range(4):
        c = synthesize_corpus(spark, 20 + 3 * i, seed=90 + i, n_partitions=2)
        idxs.append(build_index(spark, c, str(root / f"s{i}"),
                                block_bits=5, n_partitions=2))
    delete_docs(idxs[0], [2])
    delete_docs(idxs[3], [5, 7])
    final = compact_segments(
        spark, [i.paths.root for i in idxs], str(root / "out"),
        fan_in=2, n_partitions=2,
    )
    tomb = {r["docid"] for r in final.deleted_docids().collect()}
    assert len(tomb) == 3
    # relabeled ids resolve back to the source docs via sha256 identity
    src_sha = {r["sha256"] for i, ids in ((0, [2]), (3, [5, 7]))
               for r in idxs[i].docs.where(F.col("docid").isin(ids)).collect()}
    got_sha = {r["sha256"]
               for r in final.docs.where(F.col("docid").isin(list(tomb))).collect()}
    assert got_sha == src_sha
    got = {r["docid"] for r in run_queries(final, QUERIES, k=10_000).collect()}
    assert not (got & tomb)
