"""Catalog-table ingestion (the input_hint's Iceberg-table source shape):
corpus_from_table reads any Spark-catalog table with the (repo, path,
commit, lang, content) contract, pushes the predicate to the source,
and builds an identical index to the direct-DataFrame path."""

from __future__ import annotations

import pytest


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
