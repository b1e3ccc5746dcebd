"""Round-5 lifecycle regression pack:

1. Tuned k1/b survive EVERY lifecycle verb (merge -> delete -> compact
   -> prune): a default (no-override) query at each stage is rank- and
   score-identical to the explicit-params query (round-4 verdict bug:
   finalize was re-writing k1=1.2/b=0.75 on every verb).
2. merge refuses segments finalized with different k1/b.
3. Unblocked (block_bits=None) prune with tombstone folding records the
   encode bound as stats.docid_bound so decode paths keep the bound the
   blobs were encoded with (round-4 ADVICE high: live-set num_docs
   changed the lower-bits width and mis-decoded every blob).
4. merge honors the deletes_old crash-fallback exactly like
   EFIndex.deleted_docids() (round-4 ADVICE medium).
5. Sharded retrieval over a tombstoned shard == retrieval on the
   tombstone-respecting merge of the same shards (rank identity by
   docno) — the sharded x merge composition the round-4 verdict asked
   for.
"""

from __future__ import annotations

import os
import shutil

import pytest

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.maintenance import (
    compact_index,
    delete_docs,
    deletes_path,
)
from terrier_ef_spark.index.merge import merge_indexes
from terrier_ef_spark.index.prune import prune_index
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_postings, run_queries
from terrier_ef_spark.query.sharded import run_queries_sharded

QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "return"], "mode": "disjunctive"},
]
K1, B = 1.5, 0.6


def _runs(idx, **kw):
    res = run_queries(idx, QUERIES, k=20, **kw).collect()
    out: dict = {}
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        out.setdefault(r["qid"], []).append((r["docid"], round(r["score"], 9)))
    return out


def test_k1b_survive_merge_compact_prune(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("k1b_lifecycle")
    ca = synthesize_corpus(spark, 45, seed=81, n_partitions=2)
    cb = synthesize_corpus(spark, 40, seed=82, n_partitions=2)
    a = build_index(spark, ca, str(root / "a"), block_bits=5,
                    n_partitions=2, k1=K1, b=B)
    b = build_index(spark, cb, str(root / "b"), block_bits=5,
                    n_partitions=2, k1=K1, b=B)

    m = merge_indexes(spark, a.paths.root, b.paths.root, str(root / "m"),
                      n_partitions=2)
    delete_docs(m, [1, 7, 64 + 3])
    c = compact_index(m, str(root / "c"), n_partitions=2)
    p = prune_index(c, str(root / "p"), top_n=5, n_partitions=2)

    for stage, idx in (("merge", m), ("compact", c), ("prune", p)):
        assert idx.stats["k1"] == K1 and idx.stats["b"] == B, stage
        assert _runs(idx) == _runs(idx, k1=K1, b=B), stage


def test_merge_refuses_mismatched_k1b(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("k1b_mismatch")
    ca = synthesize_corpus(spark, 30, seed=83, n_partitions=2)
    cb = synthesize_corpus(spark, 30, seed=84, n_partitions=2)
    a = build_index(spark, ca, str(root / "a"), block_bits=5,
                    n_partitions=2, k1=K1, b=B)
    b = build_index(spark, cb, str(root / "b"), block_bits=5, n_partitions=2)
    with pytest.raises(ValueError, match="BM25 params mismatch"):
        merge_indexes(spark, a.paths.root, b.paths.root,
                      str(root / "m"), n_partitions=2)


def test_unblocked_prune_with_tombstones_decodes_correctly(
    spark, tmp_path_factory
):
    """ADVICE high: prune folds tombstones, finalize recounts live
    num_docs, but the blobs were encoded against the ORIGINAL bound —
    for unblocked indexes (the build default) the bound IS num_docs, so
    it must be recorded and used by every decode path."""
    root = tmp_path_factory.mktemp("prune_unblocked")
    corpus = synthesize_corpus(spark, 60, seed=85, n_partitions=2)
    idx = build_index(spark, corpus, str(root / "i"),
                      block_bits=None, n_partitions=2)
    before = decode_postings(idx).toPandas()
    dead = [0, 5, 59]
    delete_docs(idx, dead)
    p = prune_index(idx, str(root / "p"), top_n=3, n_partitions=2)

    assert p.stats["num_docs"] == 57
    assert p.stats["docid_bound"] == 60  # the encode bound, recorded

    got = decode_postings(p).toPandas()
    # clean-room expectation: drop dead docs, keep each term's top-3
    # by (tf desc, docid asc)
    live = before[~before.docid.isin(dead)]
    keep = (
        live.sort_values(["term", "tf", "docid"],
                         ascending=[True, False, True])
        .groupby("term").head(3)
    )
    want = set(map(tuple, keep[["term", "docid", "tf"]].values))
    have = set(map(tuple, got[["term", "docid", "tf"]].values))
    assert have == want

    # end-to-end: every query path decodes with the recorded bound
    res = _runs(p)
    assert res and all(len(v) > 0 for v in res.values())
    all_docids = {d for v in res.values() for d, _ in v}
    assert not (all_docids & set(dead))


def test_merge_reads_deletes_old_crash_fallback(spark, tmp_path_factory):
    """ADVICE medium: a crash mid-swap in delete_docs parks the live
    tombstone set at deletes_old; EFIndex.deleted_docids() honors it,
    and merge must too — otherwise merging a crashed segment resurrects
    its deleted docs."""
    root = tmp_path_factory.mktemp("merge_deletes_old")
    ca = synthesize_corpus(spark, 40, seed=86, n_partitions=2)
    cb = synthesize_corpus(spark, 35, seed=87, n_partitions=2)
    a = build_index(spark, ca, str(root / "a"), block_bits=5, n_partitions=2)
    b = build_index(spark, cb, str(root / "b"), block_bits=5, n_partitions=2)
    delete_docs(a, [2, 11])
    # simulate the crash window: the new set never landed, the previous
    # set is parked aside
    os.rename(deletes_path(a.paths), deletes_path(a.paths) + "_old")
    assert {r["docid"] for r in a.deleted_docids().collect()} == {2, 11}

    m = merge_indexes(spark, a.paths.root, b.paths.root,
                      str(root / "m"), n_partitions=2)
    tomb = {r["docid"] for r in m.deleted_docids().collect()}
    assert tomb == {2, 11}
    got = {r["docid"] for r in run_queries(m, QUERIES, k=1000).collect()}
    assert not (got & tomb)


def test_sharded_tombstones_match_merged_index(spark, tmp_path_factory):
    """Composition: per-shard tombstone exclusion (sharded retrieval)
    and merge-time tombstone carry-through + exclusion must agree —
    same ranking by docno for every query."""
    root = tmp_path_factory.mktemp("shard_merge_tomb")
    ca = synthesize_corpus(spark, 45, seed=88, n_partitions=2)
    cb = synthesize_corpus(spark, 40, seed=89, n_partitions=2)
    a = build_index(spark, ca, str(root / "a"), block_bits=5, n_partitions=2)
    b = build_index(spark, cb, str(root / "b"), block_bits=5, n_partitions=2)
    delete_docs(a, [4, 17])

    m = merge_indexes(spark, a.paths.root, b.paths.root,
                      str(root / "m"), n_partitions=2)

    sharded = run_queries_sharded([a, b], QUERIES, k=15).collect()
    docno_of = [
        {r["docid"]: r["docno"] for r in s.docs.collect()} for s in (a, b)
    ]
    got_sh: dict = {}
    for r in sorted(sharded, key=lambda r: (r["qid"], r["rank"])):
        got_sh.setdefault(r["qid"], []).append(
            (docno_of[r["shard"]][r["docid"]], round(r["score"], 9))
        )

    merged = run_queries(m, QUERIES, k=15)
    from terrier_ef_spark.query.engine import with_docno

    got_m: dict = {}
    for r in sorted(with_docno(m, merged).collect(),
                    key=lambda r: (r["qid"], r["rank"])):
        got_m.setdefault(r["qid"], []).append(
            (r["docno"], round(r["score"], 9))
        )
    assert got_sh == got_m
