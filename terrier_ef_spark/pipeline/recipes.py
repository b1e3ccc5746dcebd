"""End-to-end training-corpus preparation recipe.

The composition a data pipeline actually runs, wired from the
individually gate-verified operators:

    1. near-duplicate clusters  -> drop non-canonical members
       (pipeline/clusters.dedup_clusters: MinHash-LSH candidates,
        Jaccard verify, star-contraction components)
    2. quality filter           -> drop docs failing C4/Gopher rules
       (pipeline/textstats.filter_pipeline, reasons recorded)
    3. decontamination          -> drop docs sharing n-grams with a
       benchmark set (pipeline/clusters.contamination_hits,
        broadcast semi-join)
    4. (optionally) build the EF index over the survivors.

Every drop is attributed: the survivors frame carries nothing, but
`clean_corpus` also returns a ledger DataFrame (doc_id, dropped_by) so
nothing disappears silently — the per-stage operators' own ledgers
(skipped LSH buckets etc.) still apply underneath. Stages share one
`docs` scan lineage; each decision is a semi/anti join keyed on doc_id,
so the composition adds no new shuffle shape beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.pipeline.clusters import contamination_hits, dedup_clusters
from terrier_ef_spark.pipeline.textstats import filter_pipeline


def clean_corpus(
    docs: DataFrame,
    *,
    bench: DataFrame | None = None,
    dedup_threshold: float = 0.5,
    pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (survivors, ledger): survivors is `docs` minus
    near-duplicates (non-canonical cluster members), quality-filter
    failures, and benchmark-contaminated docs; ledger is
    (doc_id, dropped_by) with dropped_by in
    {'near_duplicate', 'quality:<reasons>', 'contaminated'} — first
    matching stage wins, stages applied in that order.

    `pairs` takes the MATERIALIZED verified-pair table (doc_a, doc_b)
    — at scale pair derivation is the dominant cost and its output is
    reused (CC here, dedup audits, incremental re-dedup), so the
    production shape is: derive once, write to a table, pass the read
    back in. Without it, pairs are derived inline and persisted so the
    iterative CC never re-derives them round-to-round."""
    if pairs is None:
        from terrier_ef_spark.pipeline.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(
            docs, threshold=dedup_threshold
        ).select("doc_a", "doc_b").persist()
    dup_drops = (
        dedup_clusters(docs, edges=pairs)
        .where(~F.col("keep"))
        .select("doc_id", F.lit("near_duplicate").alias("dropped_by"))
    )
    qual_drops = (
        filter_pipeline(docs)
        .where(~F.col("keep"))
        .select(
            "doc_id",
            F.concat(F.lit("quality:"), F.col("reasons")).alias("dropped_by"),
        )
    )
    parts = [dup_drops, qual_drops]
    if bench is not None:
        parts.append(
            contamination_hits(docs, bench)
            .select("doc_id", F.lit("contaminated").alias("dropped_by"))
        )
    # first matching stage wins, deterministically: tag each stage with
    # its priority and take min_by over the union
    tagged = [
        p.withColumn("prio", F.lit(i)) for i, p in enumerate(parts)
    ]
    uni = tagged[0]
    for p in tagged[1:]:
        uni = uni.unionByName(p)
    ledger = uni.groupBy("doc_id").agg(
        F.min_by("dropped_by", "prio").alias("dropped_by")
    )
    survivors = docs.join(ledger.select("doc_id"), "doc_id", "left_anti")
    return survivors, ledger
