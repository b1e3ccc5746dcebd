"""Deterministic split/sample: reproducibility, weight ranges, DuckDB
twin parity, and zero-shuffle plan shape."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"text {i}", "en" if i % 3 else "other", "s", 10)
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_hash_split_deterministic_and_partitioned(docs):
    from terrier_ef_spark.pipeline.sampling import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(17)).collect()}
    assert a == b and len(a) == 2000  # parallelism-independent, total
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.85 < c["train"] / 2000 < 0.95  # ~90/5/5
    # a different salt reshuffles assignments
    moved = sum(
        1
        for r in hash_split(docs, salt="other").collect()
        if a[r["doc_id"]] != r["split"]
    )
    assert moved > 0


def test_hash_split_weights_validated(docs):
    from terrier_ef_spark.pipeline.sampling import hash_split

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.4})


def test_split_and_sample_match_duckdb(spark, docs, tmp_path):
    import duckdb

    from terrier_ef_spark.pipeline.sampling import (
        hash_split,
        hash_split_sql,
        stratified_sample,
        stratified_sample_sql,
    )

    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")

    want = dict(con.sql(hash_split_sql()).fetchall())
    got = {r["doc_id"]: r["split"] for r in hash_split(spark.read.parquet(pq)).collect()}
    assert got == want

    fr = {"en": 0.4, "other": 0.15}
    want_s = sorted(con.sql(stratified_sample_sql(fr)).fetchall())
    got_s = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_sample(spark.read.parquet(pq), fr).collect()
    )
    assert got_s == [tuple(r) for r in want_s]
    # per-stratum rates roughly honored; unknown strata dropped
    n_en = sum(1 for _, l in got_s if l == "en")
    n_ot = sum(1 for _, l in got_s if l == "other")
    assert 0.3 < n_en / (2000 * 2 / 3) < 0.5
    assert 0.08 < n_ot / (2000 * 1 / 3) < 0.25


def test_sampling_plan_has_no_shuffle(docs):
    from terrier_ef_spark.pipeline.sampling import hash_split, stratified_sample

    for df in (hash_split(docs), stratified_sample(docs, {"en": 0.5})):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
