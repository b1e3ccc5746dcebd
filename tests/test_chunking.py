"""Token-window chunking: hand values, cross-engine twin, no-shuffle
plan property."""

import duckdb
import pytest

from terrier_ef_spark.pipeline.chunking import (
    chunk_documents,
    chunk_documents_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_chunk_hand_values(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [(0, text, "en", "s", 0), (1, "", "en", "s", 0)])
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, size=4, stride=3).collect()
    )
    # windows: [0..3], [3..6], [6..9], [9]; empty doc emits nothing
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 4, "t3 t4 t5 t6"),
        (0, 2, 4, "t6 t7 t8 t9"),
        (0, 3, 1, "t9"),
    ]
    # non-overlapping mode: stride == size
    n = chunk_documents(docs, size=5, stride=5).count()
    assert n == 2


def test_chunk_rejects_bad_stride(spark):
    docs = _docs(spark, [(0, "a b", "en", "s", 0)])
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=0)


def test_chunk_matches_duckdb(spark, tmp_path):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 11}" for j in range(5 + i * 9)), "en", "s", 0)
        for i in range(8)
    ] + [(8, "", "en", "s", 0)]
    docs = _docs(spark, rows)
    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    want = sorted(
        (int(r[0]), int(r[1]), int(r[2]), r[3])
        for r in con.sql(chunk_documents_sql()).fetchall()
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(spark.read.parquet(pq)).collect()
    )
    assert got == want and len(got) > 8


def test_chunk_plan_has_no_shuffle(spark, tmp_path):
    docs = _docs(spark, [(0, "a b c", "en", "s", 0)])
    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    plan = (
        chunk_documents(spark.read.parquet(pq))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
