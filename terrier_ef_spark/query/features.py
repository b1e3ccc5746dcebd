"""Multi-feature extraction for learning-to-rank (PyTerrier's
FeaturesBatchRetrieve role over a terrier-ef index).

LTR pipelines retrieve a candidate set with one weighting model and
attach a feature VECTOR per (query, document) — several weighting
models plus document statistics — for a downstream re-ranker
(LambdaMART et al.). The reference's index family feeds exactly this
workflow in Terrier (FeaturesBatchRetrieve reads the same EF streams
once per feature); here the relational shape makes the features
near-free: ONE postings decode + ONE lexicon/doclen join computes
every model's contribution expression as SIBLING COLUMNS in the same
pass (engine.model_contrib_expr — the identical expressions the
single-model scorer uses), and one groupBy aggregates all of them
with map-side combine. Adding a feature adds a column, not a scan.

Candidate semantics: disjunctive — every doc matching >= 1 query
term gets a row; the output is cut to the top `k` per query by the
`rank_by` feature under the engine-wide deterministic contract
(round(score, 6) desc, docid asc), so candidate membership is
reproducible across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.engine import decode_postings, model_contrib_expr

DEFAULT_FEATURES = ("bm25", "lm_dirichlet", "pl2", "dph", "tf_idf")


def run_queries_features(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    features: tuple[str, ...] = DEFAULT_FEATURES,
    rank_by: str = "bm25",
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """(qid, rank, docid, f_<feature>..., n_matched, doclen) for the
    top-k candidates of each query [{"qid", "terms", ("weights")}],
    ranked by the `rank_by` feature (which must be in `features`).
    Repeated/weighted query terms aggregate with qtf weights into
    every feature, as the single-model scorer does."""
    if not queries:
        raise ValueError("empty query batch")
    if rank_by not in features:
        raise ValueError(f"rank_by {rank_by!r} must be one of {features}")
    stats = index.stats
    num_docs = float(stats["num_docs"])
    avgdl = float(stats["avgdl"])
    num_tokens = float(stats.get("num_tokens") or (num_docs * avgdl))
    k1 = float(stats.get("k1") or bm25.K1) if k1 is None else float(k1)
    b = float(stats.get("b") or bm25.B) if b is None else float(b)

    qterm_rows = []
    for q in queries:
        qid = int(q["qid"])
        terms = list(dict.fromkeys(q["terms"]))
        if not terms:
            raise ValueError(f"qid {qid}: empty term list")
        weights = q.get("weights") or {}
        for t in terms:
            qterm_rows.append((qid, t, float(weights.get(t, 1.0))))
    distinct_terms = sorted({t for _, t, _ in qterm_rows})

    spark = index.spark
    qterms_df = spark.createDataFrame(
        qterm_rows, "qid long, term string, w double"
    )
    lex = index.lexicon.select(
        "term",
        F.col("df").cast("double").alias("global_df"),
        F.col("cf").cast("double").alias("global_cf"),
    ).where(F.col("term").isin(distinct_terms))

    posts = (
        decode_postings(index, distinct_terms)
        .join(F.broadcast(lex), "term")
        .join(index.docs.select("docid", "doclen"), "docid")
    )
    cols = [
        model_contrib_expr(
            m, num_docs=num_docs, avgdl=avgdl, num_tokens=num_tokens,
            k1=k1, b=b,
        ).alias(f"c_{m}")
        for m in features
    ]
    posts = posts.select("term", "docid", "doclen", *cols)

    aggs = [
        F.sum(F.col(f"c_{m}") * F.col("w")).alias(f"f_{m}") for m in features
    ] + [
        F.count(F.lit(1)).alias("n_matched"),
        F.first("doclen").alias("doclen"),
    ]
    scored = (
        posts.join(F.broadcast(qterms_df), "term")
        .groupBy("qid", "docid")
        .agg(*aggs)
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round(F.col(f"f_{rank_by}"), 6)), F.asc("docid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("qid", "rank", "docid",
                *[f"f_{m}" for m in features], "n_matched",
                F.col("doclen").cast("long").alias("doclen"))
    )
