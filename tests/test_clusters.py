"""Connected-components dedup clusters, decontamination, PII redaction."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.pipeline import clusters, pii


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r["node"]: r["comp"]
        for r in clusters.connected_components(
            spark.createDataFrame(edges, "u long, v long")
        ).collect()
    }
    assert got == _union_find(edges)


def test_cc_long_chain_converges_in_log_rounds(spark):
    """A 300-node chain has diameter 300; large-star/small-star must
    resolve it without 300 rounds (the backstop is 50)."""
    edges = [(i, i + 1) for i in range(300)]
    got = clusters.connected_components(
        spark.createDataFrame(edges, "u long, v long")
    ).collect()
    assert len(got) == 301
    assert {r["comp"] for r in got} == {0}


def test_dedup_clusters_transitive(spark):
    """a~b and b~c near-dups collapse into ONE cluster even if (a,c)
    never shares an LSH bucket; pairwise output alone can't promise
    that."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (0, base + "alpha beta gamma delta"),
        (1, base + "alpha beta gamma epsilon"),
        (2, base + "alpha beta zeta epsilon"),
        (3, "completely different text about spark shuffles " * 10),
        (4, "completely different text about spark shuffles " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = clusters.dedup_clusters(docs, threshold=0.5).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out}
    assert got[0] == (0, True) and got[1] == (0, False) and got[2] == (0, False)
    assert got[3] == (3, True) and got[4] == (3, False)


def test_dedup_clusters_matches_recursive_cte_oracle(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        clusters.dedup_clusters(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(clusters.DEDUP_CLUSTERS_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "cluster_id": "int64", "keep": "bool"}),
        want.astype({"doc_id": "int64", "cluster_id": "int64", "keep": "bool"}),
    )


def test_contamination_hits(spark):
    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "question what is the capital of france answer paris"),
            (1, "nothing shared with any benchmark at all here folks"),
            (100, "what is the capital of france paris obviously"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in
           clusters.contamination_hits(docs, bench, n=5).collect()}
    # doc 0 shares 'what is the capital of' and 'is the capital of france'
    assert got == {0: 2}  # benchmark doc 100 itself excluded


def test_pii_redaction_cross_engine(spark):
    rows = [
        (0, "mail a.b+c@foo-bar.co.uk then 10.0.0.1 card 1234567890123"),
        (1, "no pii just words and 12345678 short"),
        (2, "x@y.io x@y.io 255.255.255.255 tail"),
        (3, "v1.2.3.4 is a version yet 1.2.3.4 is an ip"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = pii.redact_pii(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(pii.redact_sql()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[0, "n_pii"] == 3
    assert got.loc[1, "n_pii"] == 0  # 8-digit number stays
    assert "<EMAIL> <EMAIL> <IP>" in got.loc[2, "text_clean"]


def test_term_cooccurrence_known_pmi(spark):
    from terrier_ef_spark.pipeline import textstats

    docs = spark.createDataFrame(
        [(0, "x y x y x y"), (1, "z z z")], "doc_id long, text string"
    )
    out = textstats.term_cooccurrence(docs, window=1, min_count=1, top_k=10).collect()
    # x-y adjacent pairs: n_ab=5; z self-pairs excluded entirely
    assert len(out) == 1
    r = out[0]
    assert (r["term_a"], r["term_b"], r["n_ab"]) == ("x", "y", 5)
    # pmi = log2((5/5) / ((3/9) * (3/9))) = log2(9)
    import math

    assert abs(r["pmi"] - round(math.log2(9), 6)) < 1e-9


def test_dedup_clusters_from_materialized_pairs(spark, tmp_path):
    """The production shape: verified pairs derived once, written to a
    table, and CC run over the materialization — must produce exactly
    the inline result. clean_corpus(pairs=...) consumes the same table."""
    from terrier_ef_spark.pipeline.dedup import ngram_jaccard_pairs
    from terrier_ef_spark.pipeline.recipes import clean_corpus

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (0, base + "alpha beta gamma delta"),
        (1, base + "alpha beta gamma epsilon"),
        (2, base + "alpha beta zeta epsilon"),
        (3, "completely different text about spark shuffles " * 10),
        (4, "completely different text about spark shuffles " * 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pair_dir = str(tmp_path / "pairs")
    (ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
     .write.parquet(pair_dir))
    pairs = spark.read.parquet(pair_dir)

    inline = sorted(map(tuple, clusters.dedup_clusters(docs, 0.5).collect()))
    mat = sorted(map(tuple,
                     clusters.dedup_clusters(docs, edges=pairs).collect()))
    assert mat == inline

    surv_a, _ = clean_corpus(docs)
    surv_b, _ = clean_corpus(docs, pairs=pairs)
    assert sorted(r["doc_id"] for r in surv_a.collect()) == \
           sorted(r["doc_id"] for r in surv_b.collect())
