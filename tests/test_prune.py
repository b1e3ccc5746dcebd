"""Static index pruning: kept-set exactness, global stats, guards."""

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.prune import prune_index
from terrier_ef_spark.query.engine import decode_postings, run_queries

TOP_N = 5


@pytest.fixture(scope="module")
def pruned_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("prune")
    corpus = synthesize_corpus(spark, 300, seed=17, n_partitions=4)
    full = build_index(spark, corpus, str(root / "full"), block_bits=16,
                       n_partitions=4)
    pruned = prune_index(full, str(root / "pruned"), TOP_N, n_partitions=4)
    return full, pruned


def test_pruned_postings_are_exact_topn(spark, pruned_setup):
    full, pruned = pruned_setup
    rows = decode_postings(full).toPandas()
    want = set()
    for term, g in rows.groupby("term"):
        g = g.sort_values(["tf", "docid"], ascending=[False, True])
        for _, r in g.head(TOP_N).iterrows():
            want.add((term, int(r["docid"]), int(r["tf"])))
    got = {
        (r["term"], int(r["docid"]), int(r["tf"]))
        for r in decode_postings(pruned).collect()
    }
    assert got == want


def test_pruned_stats_keep_global_collection(pruned_setup):
    full, pruned = pruned_setup
    assert pruned.stats["num_docs"] == full.stats["num_docs"]
    assert pruned.stats["num_tokens"] == full.stats["num_tokens"]
    assert pruned.stats["avgdl"] == full.stats["avgdl"]
    assert pruned.stats["num_postings"] < full.stats["num_postings"]


def test_pruned_index_answers_queries(pruned_setup):
    full, pruned = pruned_setup
    qs = [{"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"}]
    out = run_queries(pruned, qs, k=5).collect()
    assert len(out) == 5
    # pruned results must be a subset of the full index's deeper ranking
    deep = {r["docid"] for r in run_queries(full, qs, k=300).collect()}
    assert {r["docid"] for r in out} <= deep


def test_prune_guards(spark, pruned_setup, tmp_path):
    full, pruned = pruned_setup
    with pytest.raises(ValueError, match="top_n"):
        prune_index(full, str(tmp_path / "x"), 0)
    posidx = build_index(
        spark, synthesize_corpus(spark, 30, seed=18, n_partitions=2),
        str(tmp_path / "pos"), positions=True, n_partitions=2,
    )
    with pytest.raises(ValueError, match="positional"):
        prune_index(posidx, str(tmp_path / "y"), 5)
