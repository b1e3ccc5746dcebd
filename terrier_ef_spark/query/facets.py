"""Faceted search: per-query value counts over the FULL match set.

The Solr/Elasticsearch facet/aggregation role next to ranked
retrieval: for each query, count how many matching documents carry
each value of each facet field (lang, source, site, ...), and return
the top facet values per (query, facet). Counts are over every
matching document — not the top-k page — which is what makes facets
useful as navigation.

Scale shape: one pushed-filter postings decode for the batch's term
union (the same decode stage the term-major scorer uses), a broadcast
join against the (qid, term) literal frame, one distinct to the
(qid, docid) match set, one join against the docid->facet mapping
(columns of the docs table), one count aggregation, one ranking
window per (qid, facet). Everything shuffles on bounded keys; no
self-joins, no driver-side iteration. At 10^9 docs the match set is
the dominant relation and flows through exactly two exchanges
(distinct + groupBy) — the same budget as one scoring pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_postings


def facet_counts(
    index: EFIndex,
    queries: list[dict],
    doc_facets: DataFrame,
    *,
    top_facets: int = 10,
) -> DataFrame:
    """queries: [{'qid': int, 'terms': [str, ...]}] — each query's
    match set is every doc containing >= 1 of its terms (disjunctive
    matching, the facet-navigation convention). doc_facets:
    (docid, facet, value) — one row per document per facet field; null
    values are ignored (an absent field is not a facet bucket).
    Returns (qid, facet, value, n_docs, rank) with rank 1..top_facets
    per (qid, facet) by (n_docs desc, value asc)."""
    if top_facets < 1:
        raise ValueError(f"top_facets must be >= 1: {top_facets}")
    pairs = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not pairs:
        raise ValueError("no query terms")
    spark = index.spark
    qterms = spark.createDataFrame(pairs, "qid long, term string")
    terms = sorted({t for _, t in pairs})

    matched = (
        decode_postings(index, terms)
        .select("term", "docid")
        .join(F.broadcast(qterms), "term")
        .select("qid", "docid")
        .distinct()
    )
    # tombstone exclusion (the run_queries respect_deletes convention):
    # deleted docs must not surface as facet-count navigation buckets
    tomb = index.deleted_docids()
    if tomb is not None:
        matched = matched.join(tomb.select("docid"), "docid", "left_anti")
    counts = (
        matched.join(
            doc_facets.where(F.col("value").isNotNull())
            .select("docid", "facet", "value"),
            "docid",
        )
        .groupBy("qid", "facet", "value")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("qid", "facet").orderBy(
        F.desc("n_docs"), F.asc("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_facets)
        .select("qid", "facet", "value", "n_docs", "rank")
    )
