"""IR evaluation metrics over a run + qrels — the trec_eval /
pt.Evaluate role, computed relationally.

The reference's integration tests validate retrieval by comparing
runs; real deployments close the loop with graded evaluation
(trec_eval over TREC-format runs and qrels). This module computes the
four standard ranked-retrieval metrics per query plus their means,
entirely as windowed Catalyst expressions — at a billion (qid, docid)
run rows this is two shuffles (the qrels join and the per-qid window),
no driver-side loops:

  P@k   precision at cutoff k
  RR    reciprocal rank of the first relevant result (MRR's per-query
        term; 0 when no relevant doc is retrieved)
  AP    average precision: mean over relevant RETRIEVED docs of the
        precision at each one's rank, divided by R = |relevant(q)|
        (trec_eval's map: unretrieved relevant docs count against you)
  nDCG@k  binary-gain DCG at k over the run, normalized by the ideal
        DCG of min(R, k) relevant docs at the top (Järvelin &
        Kekäläinen TOIS'02, log2(rank+1) discount, as trec_eval's
        ndcg_cut computes it for binary qrels)

Queries with no relevant documents in the qrels are excluded from the
means (trec_eval behavior). All metrics rounded to 6dp so the DuckDB
oracle twin agrees bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evaluate_run(
    run: DataFrame, qrels: DataFrame, *, k: int = 10
) -> DataFrame:
    """Per-query metrics: (qid, num_rel, num_rel_ret, p_at_k, rr, ap,
    ndcg_at_k) from a run (qid, docid, rank — 1-based, unique per qid)
    and binary qrels (qid, docid). Tie-break-free by construction: the
    run's ranks are already total."""
    rel_counts = qrels.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("num_rel")
    )
    hit = run.join(
        qrels.select("qid", "docid").withColumn("rel", F.lit(1)),
        ["qid", "docid"],
        "left",
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))

    w = Window.partitionBy("qid").orderBy("rank")
    hit = hit.withColumn("cum_rel", F.sum("rel").over(w))

    per = hit.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("num_rel_ret"),
        (
            F.sum(F.when(F.col("rank") <= k, F.col("rel")).otherwise(0))
            / F.lit(float(k))
        ).alias("p_at_k_raw"),
        F.max(
            F.when(F.col("rel") == 1, 1.0 / F.col("rank")).otherwise(None)
        ).alias("rr_raw"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("cum_rel") / F.col("rank"))
            .otherwise(0.0)
        ).alias("sum_prec_at_rel"),
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rank") <= k),
                1.0 / F.log2(F.col("rank") + 1),
            ).otherwise(0.0)
        ).alias("dcg_raw"),
    )
    # ideal DCG of min(R, k) binary-relevant docs at the top: a closed
    # per-row sum — built as an aggregate over a broadcast 1..k frame
    # so Spark and the SQL twin share the formula shape
    spark = run.sparkSession
    ranks_df = spark.createDataFrame(
        [(i, 1.0) for i in range(1, k + 1)], "i int, one double"
    ).select("i", (F.lit(1.0) / F.log2(F.col("i") + 1)).alias("g"))
    idcg = (
        rel_counts.crossJoin(F.broadcast(ranks_df))
        .where(F.col("i") <= F.least(F.col("num_rel"), F.lit(k)))
        .groupBy("qid")
        .agg(F.sum("g").alias("idcg"))
    )
    out = (
        per.join(rel_counts, "qid")
        .join(idcg, "qid", "left")
        .where(F.col("num_rel") > 0)
        .select(
            "qid",
            "num_rel",
            "num_rel_ret",
            F.round("p_at_k_raw", 6).alias("p_at_k"),
            F.round(F.coalesce(F.col("rr_raw"), F.lit(0.0)), 6).alias("rr"),
            F.round(
                F.col("sum_prec_at_rel") / F.col("num_rel"), 6
            ).alias("ap"),
            F.round(
                F.col("dcg_raw") / F.col("idcg"), 6
            ).alias("ndcg_at_k"),
        )
    )
    return out


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """One row of means over evaluate_run's output: (n_queries, map,
    mrr, mean_p_at_k, mean_ndcg_at_k) — trec_eval's 'all' summary."""
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("p_at_k"), 6).alias("mean_p_at_k"),
        F.round(F.avg("ndcg_at_k"), 6).alias("mean_ndcg_at_k"),
    )
