"""Catalog-table ingestion (the input_hint's Iceberg-table source shape):
corpus_from_table reads any Spark-catalog table with the (repo, path,
commit, lang, content) contract, pushes the predicate to the source,
and builds an identical index to the direct-DataFrame path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_corpus_from_table_builds_identical_index(spark, tiny_corpus, tmp_path):
    from terrier_ef_spark.corpus import corpus_from_table
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import decode_postings

    spark.sql("DROP TABLE IF EXISTS corpus_tbl")
    # extra column beyond the contract must be pruned, not fatal
    import pyspark.sql.functions as F

    (tiny_corpus.withColumn("stars", F.lit(3))
     .write.mode("overwrite").saveAsTable("corpus_tbl"))
    try:
        tbl = corpus_from_table(spark, "corpus_tbl")
        assert set(tbl.columns) == {
            "repo", "path", "commit", "lang", "content", "doc_id"
        }
        a = build_index(spark, tbl, str(tmp_path / "a"), n_partitions=4)
        b = build_index(spark, tiny_corpus, str(tmp_path / "b"), n_partitions=4)
        pa = decode_postings(a).orderBy("term", "docid").toPandas()
        pb = decode_postings(b).orderBy("term", "docid").toPandas()
        assert pa.equals(pb)

        # predicate pushdown path: filtered ingestion builds a subset index
        half = corpus_from_table(spark, "corpus_tbl", where="doc_id < 10")
        c = build_index(spark, half, str(tmp_path / "c"), n_partitions=4)
        assert c.stats["num_docs"] == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_tbl")


def test_corpus_from_table_missing_columns(spark):
    from terrier_ef_spark.corpus import corpus_from_table

    spark.sql("DROP TABLE IF EXISTS bad_tbl")
    spark.createDataFrame(
        [("r", "p")], "repo string, path string"
    ).write.mode("overwrite").saveAsTable("bad_tbl")
    try:
        with pytest.raises(ValueError, match="missing required columns"):
            corpus_from_table(spark, "bad_tbl")
    finally:
        spark.sql("DROP TABLE IF EXISTS bad_tbl")


def test_snapshot_latest_picks_max_order_tuple(spark):
    from terrier_ef_spark.corpus import snapshot_latest

    rows = [
        # (repo, path, commit, lang, content, ingest_id)
        ("r1", "a.py", "0b", "py", "v2", 2),
        ("r1", "a.py", "0a", "py", "v1", 1),
        ("r1", "a.py", "0c", "py", "v3", 3),
        ("r1", "b.py", "ff", "py", "only", 7),
        ("r2", "a.py", "0c", "py", "other-repo", 4),  # same path, other repo
        # commit TIE inside one group: ingest_id must break it
        ("r2", "t.py", "aa", "py", "tie-lo", 10),
        ("r2", "t.py", "aa", "py", "tie-hi", 11),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string,"
        " content string, ingest_id long",
    )
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content"], r["ingest_id"])
        for r in snapshot_latest(
            df, order_cols=("commit", "ingest_id")
        ).collect()
    }
    assert got == {
        ("r1", "a.py"): ("0c", "v3", 3),
        ("r1", "b.py"): ("ff", "only", 7),
        ("r2", "a.py"): ("0c", "other-repo", 4),
        ("r2", "t.py"): ("aa", "tie-hi", 11),
    }


def test_snapshot_latest_partition_independent(spark):
    """Same winners at any parallelism (the two-cluster-size rule in
    miniature) — and against a pandas clean-room."""
    from terrier_ef_spark.corpus import snapshot_latest, synthesize_corpus

    base = synthesize_corpus(spark, 200, seed=3, n_partitions=8)
    # fold the unique synthetic paths into colliding (repo, path)
    # groups so selection has real work to do
    multi = base.withColumn(
        "path", F.concat(F.lit("p"), (F.col("doc_id") % 13).cast("string"))
    )
    outs = []
    for n in (1, 8):
        got = (
            snapshot_latest(
                multi.repartition(n), order_cols=("commit", "doc_id")
            )
            .orderBy("repo", "path")
            .toPandas()
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    pdf = multi.toPandas()
    exp = (
        pdf.sort_values(["commit", "doc_id"])
        .groupby(["repo", "path"], as_index=False)
        .last()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    got = outs[0][exp.columns.tolist()].reset_index(drop=True)
    assert got.equals(exp)


def test_snapshot_latest_partial_aggregation_plan(spark):
    """Scale guard: the plan must carry a map-side partial aggregate
    (merge_max_by after a partial max_by) around ONE exchange — the
    window formulation would shuffle every version of every file."""
    from terrier_ef_spark.corpus import snapshot_latest, synthesize_corpus

    df = snapshot_latest(
        synthesize_corpus(spark, 50, seed=3, n_partitions=4),
        order_cols=("commit", "doc_id"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchange == 1, plan
    assert "partial_max_by" in plan or "partial max_by" in plan.lower(), plan
    assert "Window" not in plan


def test_snapshot_latest_missing_column(spark, tiny_corpus):
    from terrier_ef_spark.corpus import snapshot_latest

    with pytest.raises(ValueError, match="missing columns"):
        snapshot_latest(tiny_corpus, order_cols=("commit_ts",))
