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
