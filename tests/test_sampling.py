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


def test_mixture_rates_hand_computed(spark):
    from terrier_ef_spark.pipeline.sampling import mixture_rates

    # A: 8 docs, B: 2 docs. T=2 -> exponent 0.5:
    # z = sqrt(8)+sqrt(2); share_A = sqrt(8)/z = 2/3, share_B = 1/3.
    # budget 0.5*10 = 5 docs: rate_A = 5*(2/3)/8, rate_B = 5*(1/3)/2
    rows = [(i, "t", "A" if i < 8 else "B", "s", 1) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r.lang: (r.n_docs, r.share, r.rate)
        for r in mixture_rates(docs, temperature=2.0, budget_frac=0.5).collect()
    }
    assert got["A"] == (8, round(2 / 3, 6), round(5 * (2 / 3) / 8, 6))
    assert got["B"] == (2, round(1 / 3, 6), round(5 * (1 / 3) / 2, 6))
    # T>1 upweights the rare domain: B keeps a larger fraction than A
    assert got["B"][2] > got["A"][2]

    # T=1 is the natural mixture: every domain keeps exactly budget_frac
    nat = {
        r.lang: r.rate
        for r in mixture_rates(docs, temperature=1.0, budget_frac=0.5).collect()
    }
    assert nat == {"A": 0.5, "B": 0.5}


def test_mixture_rate_caps_at_one(spark):
    from terrier_ef_spark.pipeline.sampling import mixture_rates

    # extreme flattening + large budget: the rare domain's target
    # exceeds its supply -> rate caps at 1 (no upsampling)
    rows = [(i, "t", "A" if i < 99 else "B", "s", 1) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r.lang: r.rate
        for r in mixture_rates(
            docs, temperature=100.0, budget_frac=0.9
        ).collect()
    }
    assert got["B"] == 1.0
    assert got["A"] < 1.0


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    from terrier_ef_spark.pipeline.sampling import (
        mixture_rates,
        mixture_sample,
    )

    rows = [
        (i, "t", "en" if i % 4 else "rare", "s", 1) for i in range(2000)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    a = sorted(r.doc_id for r in mixture_sample(docs).collect())
    b = sorted(
        r.doc_id for r in mixture_sample(docs.repartition(7)).collect()
    )
    assert a == b and a  # parallelism-independent
    # realized per-domain keep fractions approximate the rates
    rates = {r.lang: r.rate for r in mixture_rates(docs).collect()}
    kept = mixture_sample(docs).groupBy("lang").count().collect()
    tot = {"en": 1500, "rare": 500}
    for r in kept:
        assert abs(r["count"] / tot[r.lang] - rates[r.lang]) < 0.06


def test_mixture_guards(spark):
    from terrier_ef_spark.pipeline.sampling import mixture_rates

    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError):
        mixture_rates(docs, temperature=0.0)
    with pytest.raises(ValueError):
        mixture_rates(docs, budget_frac=0.0)
    with pytest.raises(ValueError):
        mixture_rates(docs, budget_frac=1.5)
