"""Streaming query serving (streaming/serving.py): micro-batched
query stream over a static index — batch-parity results, multi-epoch
state via maxFilesPerTrigger, checkpoint resume, guards."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.streaming.serving import (
    read_stream_results,
    run_query_stream,
)

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
}

Q1 = [(1, ["spark", "table"], "disjunctive"), (2, ["merge"], None)]
Q2 = [(3, ["common", "value"], "conjunctive"), (1, ["value"], None)]


@pytest.fixture(scope="module")
def serve_idx(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("serve") / "idx"),
        log2_quantum=3, n_partitions=2,
    )


def _land(spark, landing, name, rows):
    staging = landing + "_stage_" + name
    spark.createDataFrame(
        rows, "qid long, terms array<string>, mode string"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(landing, exist_ok=True)
    src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(src, os.path.join(landing, name + ".parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def _rows(df):
    return sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
        for r in df.collect()
    )


def test_stream_matches_batch(serve_idx, spark, tmp_path):
    landing = str(tmp_path / "landing")
    _land(spark, landing, "a", Q1)
    res = run_query_stream(
        spark, serve_idx, landing, str(tmp_path / "out"), k=3
    )
    got = _rows(read_stream_results(spark, res))
    want = _rows(run_queries(
        serve_idx,
        [{"qid": q, "terms": t, "mode": m or "disjunctive"}
         for q, t, m in Q1],
        k=3, strategy="term_major",
    ))
    assert got == want


def test_multi_epoch_and_repeated_qid(serve_idx, spark, tmp_path):
    """maxFilesPerTrigger=1 -> one epoch per file; qid 1 appears in
    both epochs and gets a result set in each."""
    landing = str(tmp_path / "landing")
    _land(spark, landing, "a", Q1)
    _land(spark, landing, "b", Q2)
    res = run_query_stream(
        spark, serve_idx, landing, str(tmp_path / "out"), k=3,
        max_files_per_trigger=1,
    )
    all_q = Q1 + Q2
    got = _rows(read_stream_results(spark, res))
    want = []
    for q, t, m in all_q:
        want.extend(_rows(run_queries(
            serve_idx, [{"qid": q, "terms": t, "mode": m or "disjunctive"}],
            k=3, strategy="term_major",
        )))
    assert got == sorted(want)
    epochs = glob.glob(os.path.join(res, "epoch=*"))
    assert len(epochs) >= 2


def test_checkpoint_resume_serves_only_new(serve_idx, spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _land(spark, landing, "a", Q1)
    res = run_query_stream(spark, serve_idx, landing, out, k=3)
    n1 = read_stream_results(spark, res).count()
    # second run with nothing new: no extra results
    run_query_stream(spark, serve_idx, landing, out, k=3)
    assert read_stream_results(spark, res).count() == n1
    # land a new file: only its queries are served on the next run
    _land(spark, landing, "b", Q2)
    run_query_stream(spark, serve_idx, landing, out, k=3)
    got_qids = {
        r["qid"]
        for r in read_stream_results(spark, res).select("qid").collect()
    }
    assert {1, 2, 3}.issubset(got_qids)
    assert read_stream_results(spark, res).count() > n1


def test_duplicate_qid_in_batch_rejected(serve_idx, spark, tmp_path):
    landing = str(tmp_path / "landing")
    _land(spark, landing, "a", [(1, ["spark"], None), (1, ["table"], None)])
    with pytest.raises(Exception, match="duplicate qid"):
        run_query_stream(spark, serve_idx, landing, str(tmp_path / "out"))


def test_k_guard(serve_idx, spark, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        run_query_stream(
            spark, serve_idx, str(tmp_path / "x"), str(tmp_path / "y"), k=0
        )
