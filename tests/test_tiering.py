"""Hierarchical segment compaction: pure-plan shape/amplification and
docno-keyed equivalence of hierarchical vs flat merge."""

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.merge import merge_many
from terrier_ef_spark.index.tiering import (
    compact_segments,
    plan_merge_tree,
    write_amplification,
)
from terrier_ef_spark.query.engine import decode_postings, run_queries


def test_plan_shapes():
    plan = plan_merge_tree(20, fan_in=4)
    assert plan == [
        [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15],
         [16, 17, 18, 19]],
        [[0, 1, 2, 3], [4]],
        [[0, 1]],
    ]
    assert write_amplification(20, fan_in=4) == 3
    # pairwise chaining would write the accumulated big segment 19x;
    # the tree writes every byte at most 3x (ceil(log4 20))
    plan9 = plan_merge_tree(9, fan_in=8)
    assert plan9 == [[[0, 1, 2, 3, 4, 5, 6, 7], [8]], [[0, 1]]]
    assert plan_merge_tree(1) == []
    assert write_amplification(1) == 0
    with pytest.raises(ValueError, match="fan_in"):
        plan_merge_tree(4, fan_in=1)
    with pytest.raises(ValueError, match="at least one"):
        plan_merge_tree(0)


def test_hierarchical_equals_flat_merge(spark, tmp_path):
    """fan_in=2 over 5 segments (exercises singleton carry-through and
    3 levels): identical postings and query scores as one flat
    merge_many, keyed by docno (absolute docids legitimately differ by
    alignment gaps)."""
    segs = []
    for i in range(5):
        c = synthesize_corpus(spark, 30 + 4 * i, seed=50 + i, n_partitions=2)
        d = str(tmp_path / f"s{i}")
        build_index(spark, c, d, block_bits=5, n_partitions=2)
        segs.append(d)

    flat = merge_many(spark, segs, str(tmp_path / "flat"), n_partitions=2)
    tree = compact_segments(spark, segs, str(tmp_path / "tree"),
                            fan_in=2, n_partitions=2)

    def postings_by_docno(idx):
        return {
            (r["term"], r["docno"], r["tf"])
            for r in decode_postings(idx)
            .join(idx.docs.select("docid", "docno"), "docid")
            .collect()
        }

    assert postings_by_docno(tree) == postings_by_docno(flat)
    assert tree.stats["num_docs"] == flat.stats["num_docs"]
    assert tree.stats["num_postings"] == flat.stats["num_postings"]

    queries = [{"qid": 1, "terms": ["import", "def"]},
               {"qid": 2, "terms": ["class", "return"]}]

    def scores_by_docno(idx):
        res = run_queries(idx, queries, k=10_000, strategy="term_major")
        return sorted(
            (r["qid"], r["docno"], round(r["score"], 9))
            for r in res.join(idx.docs.select("docid", "docno"), "docid")
            .collect()
        )

    got, want = scores_by_docno(tree), scores_by_docno(flat)
    assert got == want and len(got) > 0


def test_compact_segments_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="at least one"):
        compact_segments(spark, [], str(tmp_path / "o"))
    with pytest.raises(ValueError, match="no compaction"):
        compact_segments(spark, [str(tmp_path / "only")], str(tmp_path / "o"))
