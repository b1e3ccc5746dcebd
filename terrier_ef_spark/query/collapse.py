"""Field collapsing (site/host collapsing): cap how many results any
one key (site, domain, source, author) contributes to a result page.

Web-scale serving returns at most 1-2 results per host so one
boilerplate-heavy site cannot monopolize the page — Terrier/Solr call
it field collapsing, web engines site collapsing. It is a pure
post-ranking transform: given a deep ranked list and a docid->key
mapping, keep the best `per_key` results per (query, key), then
re-rank what survives.

Scale shape: one join of the (qid x depth)-row result list against the
doc-key mapping (a column of the docs/documents table — Catalyst
broadcasts the small side automatically), then two ranking windows
partitioned by (qid, key) and (qid). Linear in the result list, no
self-joins; at serving depth (hundreds of rows per query) this is
broker-sized work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_top_k(
    results: DataFrame,
    doc_keys: DataFrame,
    *,
    k: int = 10,
    per_key: int = 1,
) -> DataFrame:
    """Collapse a ranked result list (qid, rank, docid, score — rank
    unique per qid, as every engine entry point emits) to at most
    `per_key` results per (qid, key), preserving rank order, then
    re-rank survivors to top-k. doc_keys: (docid, key) with one row per
    docid; a docid missing from it has no site identity, so it is never
    collapsed — each keyless doc is its own group (key comes back
    null). Returns (qid, rank, docid, key, score)."""
    if k < 1 or per_key < 1:
        raise ValueError(f"k and per_key must be >= 1: k={k} per_key={per_key}")
    j = results.join(
        doc_keys.select("docid", "key"), "docid", "left"
    )
    # keyless docs must not collapse into one shared null group: give
    # each a synthetic group of its own (\x00 prefix cannot clash with
    # a real key rendered as a string)
    grp = F.coalesce(
        F.col("key").cast("string"),
        F.concat(F.lit("\x00docid:"), F.col("docid").cast("string")),
    )
    w_key = Window.partitionBy("qid", grp).orderBy(F.asc("rank"))
    w_q = Window.partitionBy("qid").orderBy(F.asc("rank"))
    return (
        j.withColumn("key_rank", F.row_number().over(w_key))
        .where(F.col("key_rank") <= per_key)
        .withColumn("new_rank", F.row_number().over(w_q))
        .where(F.col("new_rank") <= k)
        .select(
            "qid", F.col("new_rank").alias("rank"), "docid", "key", "score"
        )
    )
