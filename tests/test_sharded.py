"""Sharded retrieval with global statistics: rank-identity (by docno)
with querying the merged index — the semantics sharding must preserve —
plus a demonstration that per-shard-stats scoring would diverge."""

import numpy as np
import pytest

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.merge import merge_many
from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.sharded import run_queries_sharded

QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "self", "return"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["the", "if"], "mode": "disjunctive"},
]


@pytest.fixture(scope="module")
def shard_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded")
    shards = []
    # deliberately skewed shard sizes: per-shard avgdl/df differ, so
    # per-shard-stats scoring would NOT match the merged index
    for i, (n, seed) in enumerate(((120, 71), (40, 72), (80, 73))):
        c = synthesize_corpus(spark, n, seed=seed, n_partitions=2)
        d = str(root / f"s{i}")
        shards.append(build_index(spark, c, d, block_bits=5, n_partitions=2))
    merged = merge_many(
        spark, [str(root / f"s{i}") for i in range(3)],
        str(root / "m"), n_partitions=2,
    )
    return shards, merged


def test_sharded_equals_merged_by_docno(spark, shard_setup):
    shards, merged = shard_setup
    res = run_queries_sharded(shards, QUERIES, k=10)
    got = []
    for r in res.collect():
        docno = (
            shards[r["shard"]].docs
            .where(f"docid = {r['docid']}").select("docno").collect()[0][0]
        )
        got.append((r["qid"], r["rank"], docno, round(r["score"], 9)))

    mres = run_queries(merged, QUERIES, k=10, strategy="term_major")
    want = [
        (r["qid"], r["rank"], r["docno"], round(r["score"], 9))
        for r in mres.join(
            merged.docs.select("docid", "docno"), "docid"
        ).select("qid", "rank", "docno", "score").collect()
    ]
    assert sorted(got) == sorted(want) and len(got) > 0


def test_tombstoned_shards_merge_to_identical_ranking(
    spark, shard_setup, tmp_path
):
    """The merge x sharded-retrieval tombstone composition (r4 verdict
    task 8): query a sharded set where one shard carries tombstones,
    then merge the shards — merge relabels and carries the tombstones,
    so the merged index must reproduce the sharded ranking docno-for-
    docno (both sides keep collection-level stats pre-compaction)."""
    from terrier_ef_spark.index.maintenance import clear_deletes, delete_docs

    shards, _ = shard_setup
    base = run_queries_sharded(shards, QUERIES, k=10).collect()
    victim = next(r["docid"] for r in base if r["shard"] == 1)
    try:
        delete_docs(shards[1], [int(victim)])
        res = run_queries_sharded(shards, QUERIES, k=10)
        got = []
        for r in res.collect():
            docno = (
                shards[r["shard"]].docs
                .where(f"docid = {r['docid']}")
                .select("docno").collect()[0][0]
            )
            got.append((r["qid"], r["rank"], docno, round(r["score"], 9)))

        merged = merge_many(
            spark, [s.paths.root for s in shards],
            str(tmp_path / "m_tomb"), n_partitions=2,
        )
        assert merged.deleted_docids() is not None
        mres = run_queries(merged, QUERIES, k=10, strategy="term_major")
        want = [
            (r["qid"], r["rank"], r["docno"], round(r["score"], 9))
            for r in mres.join(
                merged.docs.select("docid", "docno"), "docid"
            ).select("qid", "rank", "docno", "score").collect()
        ]
        assert sorted(got) == sorted(want) and len(got) > 0
        # the tombstoned doc is in neither ranking
        gone = shards[1].docs.where(f"docid = {victim}") \
            .select("docno").collect()[0][0]
        assert all(d != gone for _, _, d, _ in got)
    finally:
        clear_deletes(shards[1])


def test_per_shard_stats_would_diverge(spark, shard_setup):
    """Sanity that the global-stats machinery is load-bearing: scoring
    each shard with ITS OWN stats and fusing gives different scores for
    the same document (the skewed shards have different avgdl/df)."""
    shards, merged = shard_setup
    local = {}
    for i, s in enumerate(shards):
        for r in run_queries(s, QUERIES[:1], k=50,
                             strategy="term_major").collect():
            docno = s.docs.where(f"docid = {r['docid']}") \
                .select("docno").collect()[0][0]
            local[docno] = round(r["score"], 6)
    glob = {}
    res = run_queries_sharded(shards, QUERIES[:1], k=50)
    for r in res.collect():
        docno = (
            shards[r["shard"]].docs
            .where(f"docid = {r['docid']}").select("docno").collect()[0][0]
        )
        glob[docno] = round(r["score"], 6)
    common = set(local) & set(glob)
    assert common
    assert any(local[d] != glob[d] for d in common)


def test_sharded_guards(spark):
    with pytest.raises(ValueError, match="at least one"):
        run_queries_sharded([], QUERIES)


def test_sharded_respects_per_shard_tombstones(spark, shard_setup):
    """Tombstoning a doc in one shard removes it from the sharded
    results while every other row keeps its score (statistics stay
    global pre-compaction, as on the single-index delete path)."""
    from terrier_ef_spark.index.maintenance import clear_deletes, delete_docs

    shards, _ = shard_setup
    before = {(r["qid"], r["shard"], r["docid"]): r["score"]
              for r in run_queries_sharded(shards, QUERIES, k=50).collect()}
    victim = next((q, sh, d) for (q, sh, d) in before if sh == 1)
    try:
        delete_docs(shards[1], [victim[2]])
        after = {(r["qid"], r["shard"], r["docid"]): r["score"]
                 for r in run_queries_sharded(shards, QUERIES, k=50).collect()}
        assert all(k[1] != 1 or k[2] != victim[2] for k in after)
        for key, score in after.items():
            if key in before:
                assert abs(score - before[key]) < 1e-12
    finally:
        clear_deletes(shards[1])


def test_empty_shard_skipping_is_lossless(spark, shard_setup, tmp_path):
    """A shard whose lexicon matches no query term is skipped without
    changing results; a query matching NOTHING anywhere returns empty."""
    shards, _ = shard_setup
    rows = [("r", "x0", "c0", "t", "qqqzz wwwzz qqqzz", 0),
            ("r", "x1", "c0", "t", "wwwzz eeezz", 1)]
    alien = build_index(
        spark,
        spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string,"
            " content string, doc_id long"),
        str(tmp_path / "alien"), block_bits=5, n_partitions=2,
    )
    mixed = shards + [alien]
    with_skip = sorted(map(tuple, run_queries_sharded(
        mixed, QUERIES, k=10).collect()))
    without = sorted(map(tuple, run_queries_sharded(
        mixed, QUERIES, k=10, skip_empty_shards=False).collect()))
    # lossless: skipping the alien shard changes nothing vs scanning it
    # (note global stats DO include the alien shard's docs either way —
    # num_docs/avgdl come from stats.json, not from the scans)
    assert with_skip == without and with_skip
    assert all(r[2] != 3 for r in with_skip)  # alien shard contributes none
    assert run_queries_sharded(
        mixed, [{"qid": 9, "terms": ["nonexistent_zz"]}], k=5
    ).count() == 0
