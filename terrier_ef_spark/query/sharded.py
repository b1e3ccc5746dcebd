"""Sharded retrieval: global-statistics BM25 over N segment indexes
WITHOUT merging them.

The serving topology at 100 TB is many immutable segments (per-crawl,
per-epoch) behind one query API. Scoring each shard independently and
fusing is WRONG for BM25: per-shard df/avgdl differ, so the same
(term, doc) pair scores differently depending on which shard holds it
(the classic distributed-IR global-statistics problem). The correct
semantics — identical to querying one merged index — need collection
statistics aggregated ACROSS shards:

    N      = sum_s num_docs_s          avgdl = sum_s num_tokens_s / N
    df(t)  = sum_s df_s(t)             cf(t) = sum_s cf_s(t)

Relational shape: the global lexicon slice for the query terms is a
union + groupBy over the shards' (tiny, term-pushed) lexicon scans;
each shard's matched postings decode exactly as the single-index
term-major scorer does (pushed isin, partitioned doclen join against
its own docs table); the scored contributions union and fold per
(qid, shard, docid). No shard ever sees another shard's postings —
only the few-rows-per-query-term statistics cross shards, which is
what a real broker topology ships too.

Rank-identity with the merged index is the test contract
(test_sharded.py): merge_many is zero-recode, so "query the shards"
and "query the merge" must produce identical (docno, score) rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import (
    RESULT_SCHEMA,
    _bm25_contrib_expr,
    decode_postings,
)

SHARDED_RESULT_SCHEMA = (
    "qid long, rank int, shard int, docid long, score double"
)


def run_queries_sharded(
    shards: list[EFIndex],
    queries: list[dict],
    *,
    k: int = 10,
    skip_empty_shards: bool = True,
    selected_pairs: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Disjunctive BM25 top-k over `shards` with GLOBAL collection
    statistics. Returns (qid, rank, shard, docid, score) — shard is the
    index into `shards`, docid is shard-local (shards have independent
    docid spaces; map via each shard's docs table docno for a global
    identity). Tie-break (score desc, shard asc, docid asc).

    skip_empty_shards: consult each shard's (tiny, term-pushed) lexicon
    slice first and skip shards matching NO query term — losslessly: a
    shard with df(t)=0 for every query term cannot contribute a
    candidate, and the global statistics come from the same slices
    (an absent term adds 0 to every sum). Segment-level partition
    pruning: one metadata-sized job per shard replaces a postings
    scan — the resource-selection baseline of a broker topology.

    selected_pairs: optional (qid, shard) routing table (selective
    search, query/selection.py). Candidates are restricted to each
    query's selected shards; collection statistics stay GLOBAL over all
    `shards` so surviving documents score identically to exhaustive
    search. Shards selected by NO query are skipped before their
    postings are ever scanned."""
    if not shards:
        raise ValueError("need at least one shard")
    spark = shards[0].spark
    sel_shards = None
    if selected_pairs is not None:
        bad = [s for _, s in selected_pairs if not 0 <= s < len(shards)]
        if bad:
            raise ValueError(f"selected_pairs shard out of range: {bad}")
        sel_shards = {s for _, s in selected_pairs}
    qterm_rows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not qterm_rows:
        return spark.createDataFrame([], SHARDED_RESULT_SCHEMA)
    terms = sorted({t for _, t in qterm_rows})
    qterms_df = spark.createDataFrame(qterm_rows, "qid long, term string")

    num_docs = float(sum(s.stats["num_docs"] for s in shards))
    num_tokens = float(sum(s.stats["num_tokens"] for s in shards))
    avgdl = num_tokens / num_docs

    # global per-term df: union of the shards' pushed lexicon slices
    lex_parts = [
        s.lexicon.select("term", "df").where(F.col("term").isin(terms))
        for s in shards
    ]
    glex = lex_parts[0]
    for p in lex_parts[1:]:
        glex = glex.unionByName(p)
    glex = glex.groupBy("term").agg(
        F.sum("df").cast("double").alias("global_df")
    )

    parts = []
    for i, s in enumerate(shards):
        if sel_shards is not None and i not in sel_shards:
            continue  # routed away by resource selection: never scanned
        if skip_empty_shards and lex_parts[i].limit(1).count() == 0:
            continue  # no query term exists in this shard: lossless skip
        rows = (
            decode_postings(s, terms)
            .join(s.docs.select("docid", "doclen"), "docid")
            .withColumn("shard", F.lit(i))
        )
        # per-shard tombstones (index/maintenance.py): excluded here,
        # with statistics staying global-pre-compaction — the same
        # Lucene-style semantics as the single-index delete-aware path
        tomb = s.deleted_docids()
        if tomb is not None:
            rows = rows.join(tomb.select("docid"), "docid", "left_anti")
        parts.append(rows.select("shard", "term", "docid", "tf", "doclen"))
    if not parts:  # every shard skipped: no query term exists anywhere
        return spark.createDataFrame([], SHARDED_RESULT_SCHEMA)
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)

    tf = F.col("tf").cast("double")
    dl = F.col("doclen").cast("double")
    contrib = _bm25_contrib_expr(num_docs, avgdl, tf, dl)
    scored = (
        uni.join(F.broadcast(glex), "term")
        .select("shard", "term", "docid", contrib.alias("contrib"))
        .join(F.broadcast(qterms_df), "term")
    )
    if selected_pairs is not None:
        sel_df = spark.createDataFrame(
            sorted(set(selected_pairs)), "qid long, shard int"
        )
        scored = scored.join(F.broadcast(sel_df), ["qid", "shard"], "left_semi")
    scored = scored.groupBy("qid", "shard", "docid").agg(
        F.sum("contrib").alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("shard"), F.asc("docid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "shard", "docid", "score")
    )
