"""Streaming stateful exact dedup (applyInPandasWithState): first
arrival of each distinct content survives, across micro-batches AND
across separate runs sharing a checkpoint (state persistence)."""

from __future__ import annotations

import glob
import os
import shutil


def _land(df, tmpdir: str, landing: str, name: str) -> None:
    staging = os.path.join(tmpdir, "_stage_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(src, os.path.join(landing, name + ".parquet"))
    shutil.rmtree(staging)


def _mk_docs(spark, ids_and_contents):
    return spark.createDataFrame(
        [("r", f"f{d:03d}", "c" * 40, "txt", content, d)
         for d, content in ids_and_contents],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )


def test_streaming_dedup_first_arrivals(spark, tmp_path):
    from pyspark.sql import functions as F

    from terrier_ef_spark.streaming.dedup import run_dedup_stream

    # 60 docs: 0-39 unique; 40-49 duplicate contents of 0-9;
    # 50-59 intra-batch duplicate pairs (5 distinct contents)
    contents = {}
    for d in range(40):
        contents[d] = f"unique text {d}"
    for d in range(40, 50):
        contents[d] = f"unique text {d - 40}"
    for d in range(50, 60):
        contents[d] = f"pairdup text {(d - 50) // 2}"

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "dedup_out")
    os.makedirs(landing)

    # run 1: docs 0..29 (all unique) in two files -> two micro-batches
    batch_a = _mk_docs(spark, [(d, contents[d]) for d in range(30)])
    _land(batch_a.where(F.col("doc_id") < 15), str(tmp_path), landing, "a0")
    _land(batch_a.where(F.col("doc_id") >= 15), str(tmp_path), landing, "a1")
    run_dedup_stream(spark, landing, out, n_shards=8, max_files_per_trigger=1)

    surv1 = spark.read.parquet(os.path.join(out, "survivors"))
    assert surv1.count() == 30
    assert surv1.select("doc_id").distinct().count() == 30

    # run 2 (same checkpoint): docs 30..59 — 10 new uniques, 10 dups of
    # run 1's contents (suppressed by PERSISTED state), 5 pair contents
    batch_b = _mk_docs(spark, [(d, contents[d]) for d in range(30, 60)])
    _land(batch_b, str(tmp_path), landing, "b0")
    run_dedup_stream(spark, landing, out, n_shards=8, max_files_per_trigger=1)

    surv = spark.read.parquet(os.path.join(out, "survivors")).toPandas()
    # one survivor per distinct content, none lost, none double-emitted
    assert len(surv) == 45
    assert surv["content_hash"].nunique() == 45
    # cross-run duplicates (docs 40-49 duplicate run 1's contents) all dropped
    assert not set(range(40, 50)) & set(surv["doc_id"])
    # streaming result == batch dedup (same distinct content set)
    batch_hashes = {
        r["h"]
        for r in _mk_docs(spark, sorted(contents.items()))
        .select(F.md5("content").alias("h")).distinct().collect()
    }
    assert set(surv["content_hash"]) == batch_hashes
