"""Resource selection (selective search): rank shards per query with
CORI and query only the most promising ones.

At 100 TB the corpus lives in hundreds-to-thousands of topical or
per-crawl segments. Querying every segment for every query is the
exhaustive baseline (`query/sharded.py`); production brokers first rank
the segments by how likely they are to hold relevant documents and
route the query to the top few — selective search (Kulkarni & Callan
CIKM'10). The canonical shard ranker is CORI (Callan, Lu & Croft
SIGIR'95): treat each shard as one "giant document" whose term
statistics come from its lexicon, and score

    T(t, s)   = df_s(t) / (df_s(t) + 50 + 150 * cw_s / avg_cw)
    I(t)      = log((C + 0.5) / cf(t)) / log(C + 1.0)
    belief    = b + (1 - b) * T * I          (b = 0.4)
    score(q,s)= sum over q's distinct terms of belief(t, s)

where C = number of shards, cw_s = shard s's token count, cf(t) = the
number of SHARDS whose lexicon contains t (not collection frequency),
and a term absent from a shard contributes the default belief b.

Scale shape: the ONLY distributed work is one term-pushed lexicon
slice per shard (a few rows per query term — the same metadata-sized
probe `run_queries_sharded` already does for empty-shard skipping).
Shard token counts are stats.json scalars. Everything downstream is a
(queries x shards)-row frame — broker-sized by construction, exactly
what a real federation tier ships between machines. No posting list is
touched until the query is routed, which is the entire point: with
n_select=R out of C shards, the posting-decode work drops by ~R/C.

Selective retrieval keeps collection statistics GLOBAL (summed over
all shards, cheap lexicon-slice metadata) so scores remain comparable
to exhaustive search — the standard selective-search evaluation setup;
only the candidate set is restricted to the selected shards.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.sharded import run_queries_sharded

CORI_B = 0.4  # default belief, Callan et al. SIGIR'95


def rank_shards_cori(
    shards: list[EFIndex],
    queries: list[dict],
    *,
    b: float = CORI_B,
) -> DataFrame:
    """Rank `shards` for each query with CORI. Returns
    (qid, rank, shard, score) with score rounded to 6dp and ties broken
    by shard index ascending; every (qid, shard) pair appears (a shard
    matching no query term still earns the default belief b per term).
    """
    if not shards:
        raise ValueError("need at least one shard")
    if not 0.0 <= b < 1.0:
        raise ValueError(f"CORI default belief b must be in [0, 1): {b}")
    spark = shards[0].spark
    qterm_rows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not qterm_rows:
        return spark.createDataFrame(
            [], "qid long, rank int, shard int, score double"
        )
    terms = sorted({t for _, t in qterm_rows})
    qterms = spark.createDataFrame(qterm_rows, "qid long, term string")

    n_shards = len(shards)
    cws = [float(s.stats["num_tokens"]) for s in shards]
    avg_cw = sum(cws) / n_shards
    shard_rows = [(i, cw) for i, cw in enumerate(cws)]
    shards_df = spark.createDataFrame(shard_rows, "shard int, cw double")

    # one term-pushed lexicon slice per shard: df for the query terms
    # that exist there (a few rows each — broker-sized metadata)
    slices = [
        s.lexicon.select(
            F.lit(i).alias("shard"), "term", F.col("df").cast("double")
        ).where(F.col("term").isin(terms))
        for i, s in enumerate(shards)
    ]
    sdf = slices[0]
    for p in slices[1:]:
        sdf = sdf.unionByName(p)
    sdf = sdf.persist()  # read twice: per-shard df and cross-shard cf

    # cf(t) = number of shards containing t (slices only carry df > 0)
    cfsh = sdf.groupBy("term").agg(F.count("*").cast("double").alias("cf"))

    grid = qterms.crossJoin(F.broadcast(shards_df))  # queries x shards
    j = (
        grid.join(F.broadcast(sdf), ["shard", "term"], "left")
        .join(F.broadcast(cfsh), "term", "left")
        .withColumn("df0", F.coalesce("df", F.lit(0.0)))
        .withColumn("cf0", F.coalesce("cf", F.lit(0.0)))
    )
    t_part = F.col("df0") / (
        F.col("df0") + F.lit(50.0) + F.lit(150.0) * F.col("cw") / F.lit(avg_cw)
    )
    i_part = F.when(
        F.col("cf0") > 0,
        F.log((n_shards + 0.5) / F.col("cf0")) / math.log(n_shards + 1.0),
    ).otherwise(F.lit(0.0))
    belief = F.lit(b) + F.lit(1.0 - b) * t_part * i_part
    scored = (
        j.select("qid", "shard", belief.alias("belief"))
        .groupBy("qid", "shard")
        .agg(F.round(F.sum("belief"), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("shard"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .select("qid", "rank", "shard", "score")
    )


def run_queries_selective(
    shards: list[EFIndex],
    queries: list[dict],
    *,
    k: int = 10,
    n_select: int = 1,
    b: float = CORI_B,
) -> DataFrame:
    """Disjunctive BM25 top-k restricted, per query, to that query's
    CORI top-`n_select` shards — collection statistics stay GLOBAL (all
    shards), so scores are identical to exhaustive `run_queries_sharded`
    for every document that lives in a selected shard. Returns
    (qid, rank, shard, docid, score).

    The selection is collected driver-side — it is len(queries) x
    n_select rows by construction (broker routing-table sized), and the
    shard union loop needs it BEFORE building the plan so unselected
    shards' postings are never scanned at all (the selective-search
    saving; a semi-join after the fact would still decode every shard).
    """
    if n_select < 1:
        raise ValueError(f"n_select must be >= 1: {n_select}")
    sel = (
        rank_shards_cori(shards, queries, b=b)
        .where(F.col("rank") <= n_select)
        .select("qid", "shard")
        .collect()
    )
    pairs = [(int(r["qid"]), int(r["shard"])) for r in sel]
    return run_queries_sharded(shards, queries, k=k, selected_pairs=pairs)
