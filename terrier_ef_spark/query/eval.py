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


def qpp_predictors(
    index, queries: list[dict], *, k: int = 100, strategy: str = "term_major"
) -> DataFrame:
    """Query-performance prediction features, one row per query —
    the standard pre-retrieval predictors of He & Ounis (SPIRE 2004)
    plus a post-retrieval score-dispersion signal:

      n_terms   query terms found in the lexicon (absent terms carry
                no collection statistics and are skipped; queries with
                NO present terms are excluded)
      avg_idf, max_idf   over log2((N+1)/(df+0.5))
      avg_ictf  (1/|Q|) * sum log2(C / cf)  — inverse collection
                term frequency
      scs       simplified clarity score:
                sum P(w|Q) log2(P(w|Q) / P(w|C)), P(w|Q) = qtf/|Q|,
                P(w|C) = cf/C
      topk_mean, topk_std, score_cv   mean / population-stddev /
                coefficient of variation of the BM25 top-k scores —
                the dispersion quantity NQC-family post-retrieval
                predictors build on (Shtok et al.); reported as the
                plain CV rather than NQC's corpus-score normalization,
                which has no canonical BM25 form.

    All floats rounded to 6dp (oracle-twin discipline). Relational
    shape: one broadcast qterms-lexicon join + one groupBy for the
    pre-retrieval block; the post-retrieval block aggregates the
    engine's own top-k (k x |queries| rows)."""
    from terrier_ef_spark.query.engine import run_queries

    spark = index.spark
    stats = index.stats
    num_docs = float(stats["num_docs"])
    num_tokens = float(stats["num_tokens"])

    rows = []
    for q in queries:
        qid = int(q["qid"])
        terms = list(q["terms"])
        n_q = len(terms)
        for t in dict.fromkeys(terms):
            rows.append((qid, t, float(terms.count(t)), float(n_q)))
    qdf = spark.createDataFrame(
        rows, "qid long, term string, qtf double, n_q double"
    )
    lex = index.lexicon.select(
        "term",
        F.col("df").cast("double").alias("df"),
        F.col("cf").cast("double").alias("cf"),
    )
    idf = F.log2(F.lit(num_docs + 1) / (F.col("df") + 0.5))
    ictf = F.log2(F.lit(num_tokens) / F.col("cf"))
    pwq = F.col("qtf") / F.col("n_q")
    scs_term = pwq * F.log2(pwq / (F.col("cf") / F.lit(num_tokens)))
    pre = (
        qdf.join(F.broadcast(lex), "term")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(F.avg(idf), 6).alias("avg_idf"),
            F.round(F.max(idf), 6).alias("max_idf"),
            F.round(F.avg(ictf), 6).alias("avg_ictf"),
            F.round(F.sum(scs_term), 6).alias("scs"),
        )
    )
    # stable top-k membership: deep-fetch at full precision, re-rank on
    # (round(score, 6), docid) and aggregate the ROUNDED scores — the
    # same engine-independent cut discipline as the retrieval keys
    deep = run_queries(index, queries, k=2 * k, strategy=strategy)
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid")
    )
    top = (
        deep.withColumn("r6", F.row_number().over(w))
        .where(F.col("r6") <= k)
        .select("qid", F.round("score", 6).alias("s6"))
    )
    post = top.groupBy("qid").agg(
        F.round(F.avg("s6"), 6).alias("topk_mean"),
        F.round(F.coalesce(F.stddev_pop("s6"), F.lit(0.0)), 6).alias(
            "topk_std"
        ),
    )
    return (
        pre.join(post, "qid", "left")
        .select(
            "qid", "n_terms", "avg_idf", "max_idf", "avg_ictf", "scs",
            "topk_mean", "topk_std",
            F.round(
                F.when(F.col("topk_mean") != 0.0,
                       F.col("topk_std") / F.col("topk_mean"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("score_cv"),
        )
    )
