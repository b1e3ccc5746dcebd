"""Significant-terms aggregation: terms over-represented in a query's
match set relative to the background corpus.

The Elasticsearch `significant_terms` role (the "uncommonly common"
aggregation used for topic discovery, categorization drift, and
related-concept mining) next to ranked retrieval: for each query,
compare every term's document frequency WITHIN the matching documents
(foreground) against its collection document frequency (background)
and surface the terms whose foreground rate most exceeds their
background rate. Scored with the JLH heuristic Elasticsearch ships as
its default: (fg% - bg%) * (fg% / bg%) — the absolute lift times the
relative lift, which balances high-frequency and rare candidates.
The reference engine (terrier-ef) delegates this serving-stack role
to the host platform; the direct index (Invert2Direct.java workflow)
is exactly the structure that makes it one gather instead of a
re-tokenization pass.

Scale shape: one pushed-filter postings decode for the batch's query
terms (the facet_counts match-set stage), one docid semi-join that
restricts the direct index BEFORE any blob is decoded (only matching
documents' forward postings are ever touched), one groupBy to
per-(qid, term) foreground df, a broadcast join against the bounded
per-qid foreground sizes, and one lexicon join for background df —
no self-joins, no driver-side iteration, no re-tokenization of the
corpus. At 10^9 docs the foreground gather is the dominant relation
and rides exactly two exchanges (docid join + groupBy), the same
budget as one PRF expansion pass over an unbounded feedback set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.direct import decode_direct
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_postings


def significant_terms(
    index: EFIndex,
    queries: list[dict],
    *,
    top_terms: int = 10,
    min_fg_df: int = 1,
    direct: DataFrame | None = None,
) -> DataFrame:
    """queries: [{'qid': int, 'terms': [str, ...]}] — each query's
    foreground is every doc containing >= 1 of its terms (disjunctive
    matching, the aggregation convention shared with facet_counts).

    For a candidate term t in a query's foreground:
      fg_pct = fg_df / fg_size      (share of matching docs with t)
      bg_pct = df / N               (share of the collection with t)
      score  = (fg_pct - bg_pct) * (fg_pct / bg_pct)   [JLH, 6dp]
    Candidates must be over-represented (fg_pct > bg_pct) and appear
    in >= min_fg_df foreground docs; the query's own terms are
    excluded (they trivially saturate the foreground — the caller
    asked what ELSE characterizes the matches).

    Returns (qid, term, fg_df, bg_df, score, rank) with rank
    1..top_terms per qid by (score desc, term asc) on the 6dp score.
    """
    if top_terms < 1:
        raise ValueError(f"top_terms must be >= 1: {top_terms}")
    if min_fg_df < 1:
        raise ValueError(f"min_fg_df must be >= 1: {min_fg_df}")
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
    # deleted docs leave the foreground immediately; background df/N
    # stay collection-level until compaction, exactly like the BM25
    # scorer's global stats after delete_docs.
    tomb = index.deleted_docids()
    if tomb is not None:
        matched = matched.join(tomb.select("docid"), "docid", "left_anti")
    matched = matched.persist()  # consumed 3x: sizes, restriction, fg df
    # Per-qid foreground sizes: len(queries) rows by construction.
    fg_sizes = matched.groupBy("qid").agg(
        F.count("*").cast("double").alias("fg_size")
    )

    if direct is None:
        path = os.path.join(index.paths.root, "direct")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise ValueError(
                "significant_terms needs a direct (forward) index: run "
                "index.direct.build_direct(index) or build_index(..., "
                f"direct=True) first — none found at {path}"
            )
        direct = spark.read.parquet(path)
    # Restrict the forward index to matching docs BEFORE decoding any
    # blob — the semi-join keys on docid, so only foreground blobs
    # flow into the Arrow decode stage.
    fg_docs = matched.select("docid").distinct()
    dd = decode_direct(index, direct.join(fg_docs, "docid"))

    # Foreground df per (qid, term): dd holds one row per (docid,
    # termid); the matched join fans each out per qid, so count(*)
    # counts distinct foreground docs.
    fg_df = (
        dd.select("docid", "termid")
        .join(matched, "docid")
        .groupBy("qid", "termid")
        .agg(F.count("*").cast("long").alias("fg_df"))
    )

    lex = index.lexicon.select(
        "termid", "term", F.col("df").cast("long").alias("bg_df")
    )
    n_docs = float(index.stats["num_docs"])

    scored = (
        fg_df.join(lex, "termid")
        .join(F.broadcast(fg_sizes), "qid")
        .withColumn("fg_pct", F.col("fg_df") / F.col("fg_size"))
        .withColumn("bg_pct", F.col("bg_df") / F.lit(n_docs))
        .where(F.col("fg_pct") > F.col("bg_pct"))
        .where(F.col("fg_df") >= min_fg_df)
        .join(F.broadcast(qterms), ["qid", "term"], "left_anti")
        .withColumn(
            "score",
            F.round(
                (F.col("fg_pct") - F.col("bg_pct"))
                * (F.col("fg_pct") / F.col("bg_pct")),
                6,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_terms)
        .select("qid", "term", "fg_df", "bg_df", "score", "rank")
    )
