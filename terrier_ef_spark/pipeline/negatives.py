"""Hard-negative mining for retrieval training — the DPR recipe
(Karpukhin et al., EMNLP 2020: "BM25 hard negatives"; also ANCE,
RocketQA): for each training query, the top-ranked documents the
retriever surfaces that are NOT marked relevant make the strongest
contrastive negatives, far harder than random samples.

Composition over the engine (no new scoring machinery): one deep
term-major batch run, one broadcast anti-join against the positives
(training qrels are broker-sized by construction), one re-rank window
capping n_neg per query. The deep run is the only corpus-scale work,
and it is the same 10^9-doc batch scorer every retrieval key uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import run_queries


def mine_hard_negatives(
    index: EFIndex,
    queries: list[dict],
    positives: DataFrame,
    *,
    n_neg: int = 5,
    depth: int = 100,
    model: str = "bm25",
) -> DataFrame:
    """(qid, neg_rank, docid, score): each query's top `n_neg`
    NON-relevant documents from the model's deep top-`depth`, stable
    6dp ordering (ties docid asc). positives: a (qid, docid) relation
    of known-relevant pairs (the qrels); docids relevant to one query
    can still be negatives for another. Queries whose whole deep page
    is relevant yield fewer (possibly zero) negatives — mining does
    not dig past `depth` to backfill (the DPR convention: negatives
    come from the page the retriever actually serves)."""
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1: {n_neg}")
    if depth < n_neg:
        raise ValueError(
            f"depth must be >= n_neg: depth={depth} n_neg={n_neg}"
        )
    deep = run_queries(index, queries, k=depth, strategy="term_major")
    kept = deep.join(
        F.broadcast(positives.select("qid", "docid")),
        ["qid", "docid"],
        "left_anti",
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid")
    )
    return (
        kept.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_neg)
        .select(
            "qid", "neg_rank", "docid",
            F.round("score", 6).alias("score"),
        )
    )
