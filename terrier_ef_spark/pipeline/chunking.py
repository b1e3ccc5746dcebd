"""Token-window document chunking for LLM training-data pipelines:
split each document into fixed-size token windows with a configurable
stride (overlap = size - stride), the standard pretraining/RAG corpus
preparation step.

Scale shape: pure per-row Catalyst — tokenize, a `sequence` of window
starts, `slice` + `concat_ws` per window, one `posexplode`. NO shuffle
anywhere (asserted in tests/test_chunking.py); output rows ~= corpus
tokens / stride, each produced map-side, so the operator is a plain
scan at 100 TB. Chunk identity (doc_id, chunk_id) is deterministic at
any parallelism — reproducible corpus versioning, like
sampling.hash_split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.tokenizer import tokenize_expr

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — windows of `size`
    tokens every `stride` tokens; the final window may be shorter.
    Empty documents produce no chunks."""
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    toks = tokenize_expr(F.col("text"))
    d = docs.select("doc_id", toks.alias("toks"))
    starts = F.when(
        F.size("toks") > 0,
        F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_id"),
            F.least(F.lit(size), F.size("toks") - s)
            .cast("int")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice("toks", s + 1, size)).alias(
                "chunk_text"
            ),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text"
    )


def chunk_documents_sql(
    size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB twin of chunk_documents over the documents view."""
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
)
SELECT doc_id,
       (s // {stride})::INT AS chunk_id,
       least({size}, len(toks) - s)::INT AS n_tokens,
       array_to_string(toks[s + 1: s + {size}], ' ') AS chunk_text
FROM t, unnest(range(0, len(toks), {stride})) AS u(s)
"""


# ---------------------------------------------------------------------------
# GPT-style sequence packing (concat-and-split)
# ---------------------------------------------------------------------------

SEQ_LEN = 512


def pack_sequences(
    docs: DataFrame, seq_len: int = SEQ_LEN, n_partitions: int = 32
) -> DataFrame:
    """Concat-and-split sequence packing — the standard GPT-style
    pretraining batching step: documents are laid end-to-end in
    doc_id order and the token stream is cut into fixed `seq_len`
    blocks; a document straddling a boundary contributes a segment to
    each block it spans. Returns one row per (block, document
    segment):

        (chunk_id, doc_id, doc_start, doc_end, chunk_pos)

    doc_start/doc_end = the segment's token half-open range within the
    document, chunk_pos = where it lands inside the block — enough to
    materialize the packed blocks or an attention-mask boundary table
    without re-tokenizing.

    Scale shape: the only global state is each document's start offset
    in the concatenated stream — a prefix SUM computed with the same
    two-phase pattern as index/ids.assign_dense_ids (range-partition
    by doc_id, per-partition totals, driver prefix over n_partitions
    bounded values, per-partition running sum in one mapInPandas) —
    never a global single-partition window. Everything after is a
    per-row explode. `n_partitions` is caller-fixed so block identity
    is deterministic at any parallelism. Empty documents are skipped
    (they contribute no tokens)."""
    import pandas as pd

    from terrier_ef_spark.util import eager_release

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    d = (
        docs.select(
            "doc_id",
            F.size(tokenize_expr(F.col("text"))).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
        .repartitionByRange(n_partitions, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = d.groupBy("_pid").agg(F.sum("n").alias("tok")).collect()
    sizes = {int(r["_pid"]): int(r["tok"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    def add_offsets(batches):
        counter = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if counter is None:
                counter = offsets[int(pdf["_pid"].iloc[0])]
            ends = pdf["n"].cumsum() + counter
            counter = int(ends.iloc[-1])
            out = pdf.drop(columns=["_pid"])
            out["t_start"] = pd.array(ends - pdf["n"], dtype="int64")
            yield out

    with_off = d.mapInPandas(
        add_offsets, schema="doc_id long, n long, t_start long"
    )
    L = int(seq_len)
    first = F.floor(F.col("t_start") / L)
    last = F.floor((F.col("t_start") + F.col("n") - 1) / L)
    e = with_off.select(
        "doc_id", "n", "t_start",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("t_start"), F.col("chunk_id") * L)
    seg_end = F.least(F.col("t_start") + F.col("n"),
                      (F.col("chunk_id") + 1) * L)
    out = e.select(
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "doc_id",
        (seg_start - F.col("t_start")).cast("long").alias("doc_start"),
        (seg_end - F.col("t_start")).cast("long").alias("doc_end"),
        (seg_start - F.col("chunk_id") * L).cast("long").alias("chunk_pos"),
    )
    return eager_release(out, d)


def pack_sequences_sql(seq_len: int = SEQ_LEN) -> str:
    """DuckDB twin of pack_sequences over the documents view (the
    single-node window cumsum stands in for the two-phase prefix)."""
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH d AS (
  SELECT doc_id, len({toks})::bigint AS n FROM documents
  WHERE len({toks}) > 0
), o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::bigint AS t_start
  FROM d
), e AS (
  SELECT doc_id, n, t_start,
         unnest(range(t_start // {seq_len},
                      (t_start + n - 1) // {seq_len} + 1)) AS chunk_id
  FROM o
)
SELECT chunk_id::bigint AS chunk_id, doc_id,
       (greatest(t_start, chunk_id * {seq_len}) - t_start)::bigint AS doc_start,
       (least(t_start + n, (chunk_id + 1) * {seq_len}) - t_start)::bigint AS doc_end,
       (greatest(t_start, chunk_id * {seq_len})
        - chunk_id * {seq_len})::bigint AS chunk_pos
FROM e
"""
