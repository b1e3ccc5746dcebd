"""Tombstone deletes + block-selective compaction: query exclusion
semantics, blob byte-reuse outside deleted blocks, live-set stats,
positional exactness, pruning-refusal guards."""

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.maintenance import (
    clear_deletes,
    compact_index,
    delete_docs,
)
from terrier_ef_spark.query.engine import (
    decode_postings,
    decode_positions_df,
    run_queries,
)

QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "self", "return"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["if", "else"], "mode": "conjunctive"},
]

BLOCK_BITS = 5  # 32-doc blocks -> 180 docs span blocks 0..5


@pytest.fixture(scope="module")
def maint_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("maint")
    corpus = synthesize_corpus(spark, 180, seed=31, n_partitions=4)
    idx = build_index(spark, corpus, str(root / "src"), block_bits=BLOCK_BITS,
                      positions=True, n_partitions=4)
    # tombstones: ALL of block 2 (64..95) + two strays in blocks 1 and 3
    deleted = list(range(64, 96)) + [33, 101]
    n = delete_docs(idx, deleted)
    assert n == len(deleted)
    compacted = compact_index(idx, str(root / "cmp"), n_partitions=4)
    return idx, compacted, set(deleted), root


def test_delete_validation(spark, tmp_path_factory, maint_setup):
    idx, _, deleted, _ = maint_setup
    with pytest.raises(ValueError, match="empty"):
        delete_docs(idx, [])
    with pytest.raises(ValueError, match="not in index"):
        delete_docs(idx, [10_000])
    # idempotent: re-deleting an existing tombstone changes nothing
    assert delete_docs(idx, [33]) == len(deleted)


def test_query_excludes_tombstones(spark, maint_setup):
    """Tombstone exclusion == scoring restricted to the complement
    candidate set (the already-gate-verified doc_filter path)."""
    idx, _, deleted, _ = maint_setup
    live = idx.docs.select("docid").join(
        idx.deleted_docids(), "docid", "left_anti"
    )
    got = run_queries(idx, QUERIES, k=10).collect()
    want = run_queries(idx, QUERIES, k=10, respect_deletes=False,
                       doc_filter=live).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    returned = {r["docid"] for r in got}
    assert not (returned & deleted)


def test_tombstoned_index_refuses_pruning(spark, maint_setup):
    idx, _, _, _ = maint_setup
    for algo in ("bmw", "maxscore"):
        with pytest.raises(ValueError, match="tombstoned"):
            run_queries(idx, QUERIES, k=10, algo=algo)
    with pytest.raises(ValueError, match="tombstoned"):
        run_queries(idx, QUERIES, k=10, strategy="query_major")
    # explicit escape hatch: scoring the pre-delete view stays allowed
    assert run_queries(idx, QUERIES, k=3, algo="bmw",
                       respect_deletes=False).count() > 0


def test_compact_blob_byte_identity_outside_deleted_blocks(maint_setup):
    """The zero-recode proof: every blob whose block holds no deleted
    docid is byte-identical in the compacted index."""
    idx, cmp_idx, deleted, _ = maint_setup
    del_blocks = {d >> BLOCK_BITS for d in deleted}
    src = {
        (r["term"], r["block_id"]): (
            bytes(r["docids_ef"]), bytes(r["freqs_ef"]),
            bytes(r["positions_ef"]),
        )
        for r in idx.postings.collect()
    }
    out_rows = cmp_idx.postings.collect()
    out_blocks = {r["block_id"] for r in out_rows}
    assert 2 not in out_blocks  # fully-deleted block vanished
    untouched = [r for r in out_rows if r["block_id"] not in del_blocks]
    assert untouched, "fixture must leave untouched blocks"
    for r in untouched:
        assert (
            bytes(r["docids_ef"]), bytes(r["freqs_ef"]), bytes(r["positions_ef"])
        ) == src[(r["term"], r["block_id"])]


def test_compact_live_postings_and_positions(spark, maint_setup):
    idx, cmp_idx, deleted, _ = maint_setup
    src_live = {
        (r["term"], r["docid"], r["tf"])
        for r in decode_postings(idx).collect()
        if r["docid"] not in deleted
    }
    got = {(r["term"], r["docid"], r["tf"])
           for r in decode_postings(cmp_idx).collect()}
    assert got == src_live
    src_pos = {
        (r["term"], r["docid"], r["pos"])
        for r in decode_positions_df(idx).collect()
        if r["docid"] not in deleted
    }
    got_pos = {(r["term"], r["docid"], r["pos"])
               for r in decode_positions_df(cmp_idx).collect()}
    assert got_pos == src_pos


def test_compact_recomputes_live_stats(spark, maint_setup):
    idx, cmp_idx, deleted, _ = maint_setup
    assert cmp_idx.stats["num_docs"] == idx.stats["num_docs"] - len(deleted)
    live_docs = idx.docs.join(idx.deleted_docids(), "docid", "left_anti")
    want_tokens = live_docs.agg(F.sum("doclen")).collect()[0][0]
    assert cmp_idx.stats["num_tokens"] == want_tokens
    assert abs(
        cmp_idx.stats["avgdl"] - want_tokens / cmp_idx.stats["num_docs"]
    ) < 1e-9
    assert cmp_idx.deleted_docids() is None  # compacted index is clean


def test_compact_matches_filtered_rebuild(spark, maint_setup, tmp_path_factory):
    """Full ranked output on the compacted index == a fresh build over
    the live corpus (docids are corpus doc_ids, stable across both)."""
    idx, cmp_idx, deleted, _ = maint_setup
    corpus = synthesize_corpus(spark, 180, seed=31, n_partitions=4)
    fresh = build_index(
        spark,
        corpus.where(~F.col("doc_id").isin(sorted(deleted))),
        str(tmp_path_factory.mktemp("rebuild") / "fresh"),
        block_bits=BLOCK_BITS, positions=True, n_partitions=4,
    )

    def ranked(index):
        return sorted(
            (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
            for r in run_queries(
                index, QUERIES, k=10_000, strategy="term_major"
            ).collect()
        )

    assert ranked(cmp_idx) == ranked(fresh)


def test_compact_guards(spark, maint_setup, tmp_path_factory):
    idx, _, _, root = maint_setup
    with pytest.raises(ValueError, match="differ"):
        compact_index(idx, idx.paths.root)
    clean_dir = str(tmp_path_factory.mktemp("guards") / "noblock")
    noblock = build_index(
        spark, synthesize_corpus(spark, 30, seed=32, n_partitions=2),
        clean_dir, n_partitions=2,
    )
    with pytest.raises(ValueError, match="no tombstones"):
        compact_index(noblock, clean_dir + "_out")
    delete_docs(noblock, [0])
    with pytest.raises(ValueError, match="blocked"):
        compact_index(noblock, clean_dir + "_out")
    clear_deletes(noblock)
    assert noblock.deleted_docids() is None


def test_maintenance_composes_with_merge(spark, tmp_path):
    """Tombstone + compact a MERGED index (docids offset by the merge):
    live postings match the pre-delete merged decode minus tombstones,
    and untouched blocks keep their (relabeled) blob bytes."""
    from terrier_ef_spark.index.merge import merge_indexes

    ca = synthesize_corpus(spark, 40, seed=61, n_partitions=2)
    cb = synthesize_corpus(spark, 35, seed=62, n_partitions=2)
    build_index(spark, ca, str(tmp_path / "a"), block_bits=5, n_partitions=2)
    build_index(spark, cb, str(tmp_path / "b"), block_bits=5, n_partitions=2)
    m = merge_indexes(spark, str(tmp_path / "a"), str(tmp_path / "b"),
                      str(tmp_path / "m"), n_partitions=2)
    before = {(r["term"], r["docid"], r["tf"])
              for r in decode_postings(m).collect()}
    # one doc from each side: docid 3 (a) and 64+2 (b, offset = 64)
    deleted = {3, 66}
    delete_docs(m, sorted(deleted))
    cmp_idx = compact_index(m, str(tmp_path / "mc"), n_partitions=2)
    got = {(r["term"], r["docid"], r["tf"])
           for r in decode_postings(cmp_idx).collect()}
    assert got == {x for x in before if x[1] not in deleted}
    assert cmp_idx.stats["num_docs"] == m.stats["num_docs"] - 2
    # blocks 0 (docid 3) and 2 (docid 66) were touched; others byte-reuse
    src = {(r["term"], r["block_id"]): bytes(r["docids_ef"])
           for r in m.postings.collect()}
    for r in cmp_idx.postings.collect():
        if r["block_id"] not in (3 >> BLOCK_BITS, 66 >> BLOCK_BITS):
            assert bytes(r["docids_ef"]) == src[(r["term"], r["block_id"])]


def test_compact_random_deletes_property(spark, tmp_path_factory):
    """Property check across random corpora + delete sets: the
    compacted index always decodes to exactly the live posting set and
    its stats match the live docs. (Deterministic seed grid rather than
    Hypothesis: each example builds a real index, so examples are few
    and must be reproducible run-to-run.)"""
    root = tmp_path_factory.mktemp("maintprop")
    for case, (seed, mod, res) in enumerate(
        [(101, 3, 0), (202, 5, 2), (303, 2, 1), (404, 7, 6)]
    ):
        n = 50 + 13 * case
        corpus = synthesize_corpus(spark, n, seed=seed, n_partitions=2)
        idx = build_index(spark, corpus, str(root / f"i{case}"),
                          block_bits=4, n_partitions=2)
        deleted = [d for d in range(n) if d % mod == res]
        delete_docs(idx, deleted)
        cmp_idx = compact_index(idx, str(root / f"c{case}"), n_partitions=2)
        live = {(r["term"], r["docid"], r["tf"])
                for r in decode_postings(idx).collect()
                if r["docid"] % mod != res}
        got = {(r["term"], r["docid"], r["tf"])
               for r in decode_postings(cmp_idx).collect()}
        assert got == live, case
        assert cmp_idx.stats["num_docs"] == n - len(deleted), case


def test_compact_refuses_foreign_format(spark, tmp_path):
    """A params.json from a different format version must refuse to
    compact (a silently mis-decoded blob would corrupt the rewrite)."""
    import json

    corpus = synthesize_corpus(spark, 30, seed=33, n_partitions=2)
    d = str(tmp_path / "fmt")
    idx = build_index(spark, corpus, d, block_bits=4, n_partitions=2)
    delete_docs(idx, [0])
    params = json.load(open(f"{d}/params.json"))
    params["format"] = 999
    json.dump(params, open(f"{d}/params.json", "w"))
    with pytest.raises(ValueError, match="format"):
        compact_index(idx, d + "_out")
