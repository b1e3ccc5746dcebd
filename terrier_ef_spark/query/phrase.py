"""Positional (phrase) queries over the block EF index.

The reference stores positions (the `-b` block index,
EliasFanoBlockEncoders.java:60-87) but phrase matching itself lives in
Terrier core; the published semantics are standard sliding-window exact
phrase: terms must appear at consecutive positions.

Spark-first shape: decode positions to a (term, docid, pos) relation
(one vectorized mapInPandas over only the phrase terms' rows — Parquet
pushes the term filter and prunes non-position columns), then express
the phrase join relationally: anchor = pos - phrase_index; a docid whose
anchor carries every phrase index is one occurrence. That is a pure
groupBy — Catalyst plans the shuffles, AQE handles skew, and the same
SQL runs on the DuckDB oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_positions_df
from terrier_ef_spark.util import eager_release


def phrase_match(index: EFIndex, phrase: list[str], k: int = 20) -> DataFrame:
    """Top-k docs by exact-phrase occurrence count.

    Returns (docid, n_occurrences, rank); tie-break (count desc, docid
    asc). Duplicate terms in the phrase are handled via the distinct
    phrase-index count (a doc position must anchor ALL indices)."""
    spark = index.spark
    n = len(phrase)
    phrase_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "term string, idx int"
    )
    pos_rows = decode_positions_df(index, terms=phrase)
    occ = (
        pos_rows.join(F.broadcast(phrase_df), "term")
        .groupBy("docid", (F.col("pos") - F.col("idx")).alias("anchor"))
        .agg(F.count_distinct("idx").alias("nidx"))
        .where(F.col("nidx") == n)
    )
    hits = occ.groupBy("docid").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return _rank_hits(hits, k)


def _rank_hits(hits: DataFrame, k: int) -> DataFrame:
    # distributed TakeOrdered first; the single-partition ranking window
    # then sees at most k rows
    top = hits.orderBy(F.desc("n_occurrences"), F.asc("docid")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("docid"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "docid", "n_occurrences", "rank"
    )


def proximity_match(
    index: EFIndex, term_a: str, term_b: str, window: int = 5, k: int = 20
) -> DataFrame:
    """Top-k docs by count of (pos_a, pos_b) co-occurrences with
    |pos_a - pos_b| <= window — the unordered-proximity companion to
    phrase_match, on the same positional decode. Distinct terms only
    (a self-proximity query is a different operator)."""
    if term_a == term_b:
        raise ValueError("proximity_match requires two distinct terms")
    # persist: both join sides read this; without it the positional
    # decode would run twice. Released via eager_release below — the
    # returned top-k is materialized once and the decode cache freed.
    pos_rows = decode_positions_df(index, terms=[term_a, term_b]).persist()
    a = pos_rows.where(F.col("term") == term_a).select(
        "docid", F.col("pos").alias("pos_a")
    )
    b = pos_rows.where(F.col("term") == term_b).select(
        "docid", F.col("pos").alias("pos_b")
    )
    pairs = a.join(b, "docid").where(
        F.abs(F.col("pos_a") - F.col("pos_b")) <= window
    )
    hits = pairs.groupBy("docid").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return eager_release(_rank_hits(hits, k), pos_rows)
