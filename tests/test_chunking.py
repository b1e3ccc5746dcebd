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


def test_pack_sequences_hand_computed(spark):
    """Concat-and-split packing vs a hand-laid token stream: doc 0
    (3 tokens) + doc 1 (5) + doc 2 (4) at seq_len=4 -> blocks
    [d0:0-3 d1:0-1 | d1:1-5 | d2:0-4]."""
    from terrier_ef_spark.pipeline.chunking import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g h"), (2, "i j k l"), (3, "???")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["chunk_id"], r["doc_id"], r["doc_start"], r["doc_end"],
         r["chunk_pos"])
        for r in pack_sequences(docs, seq_len=4, n_partitions=2).collect()
    )
    assert rows == [
        (0, 0, 0, 3, 0),   # doc0 tokens 0..3 at block 0 pos 0
        (0, 1, 0, 1, 3),   # doc1 token 0 fills block 0
        (1, 1, 1, 5, 0),   # doc1 tokens 1..5 fill block 1
        (2, 2, 0, 4, 0),   # doc2 exactly fills block 2
    ]


def test_pack_sequences_invariants_and_determinism(spark):
    """Every block except the last holds exactly seq_len tokens with
    no gaps or overlaps; output is identical at different partition
    counts (the two-phase prefix is layout-independent)."""
    from terrier_ef_spark.pipeline.chunking import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}x{j}" for j in range(1 + (i * 7) % 13)))
         for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, seq_len=16,
                                         n_partitions=3).collect()))
    b = sorted(map(tuple, pack_sequences(docs, seq_len=16,
                                         n_partitions=7).collect()))
    assert a == b and len(a) > 0

    by_chunk: dict = {}
    for chunk_id, doc_id, s, e, pos in a:
        assert 0 <= pos < 16 and 0 <= s < e
        by_chunk.setdefault(chunk_id, []).append((pos, e - s))
    last = max(by_chunk)
    for cid, segs in by_chunk.items():
        segs.sort()
        cursor = 0
        for pos, ln in segs:
            assert pos == cursor  # no gap, no overlap
            cursor += ln
        if cid != last:
            assert cursor == 16  # full block
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
