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


def curate_training_corpus(
    docs: DataFrame,
    *,
    bench: DataFrame | None = None,
    pairs: DataFrame | None = None,
    dedup_threshold: float = 0.5,
    target: DataFrame | None = None,
    select_n: int | None = None,
    dsir_buckets: int = 4096,
    mixture_by: str | None = None,
    temperature: float = 1.0,
    budget_frac: float = 1.0,
    seq_len: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full LLM-data curation composition, wired entirely from the
    gate-verified stage operators:

        clean_corpus (near-dup clusters -> C4/Gopher quality ->
        benchmark decontamination, attributed ledger)
          -> [target + select_n]  DSIR importance selection
             (pipeline/dsir.dsir_sample: keep the select_n survivors
              that look most like the target corpus)
          -> [mixture_by]         temperature mixture sampling
             (pipeline/sampling.mixture_sample: n^(1/T) domain rates
              inside a budget_frac budget)
          -> [seq_len]            GPT-style sequence packing
             (pipeline/chunking.pack_sequences)

    Returns (result, ledger). Without seq_len the result is the
    selected documents frame; with seq_len it is the packed
    (block, doc segment) table. The ledger extends clean_corpus's with
    'dsir_rejected' and 'mixture_sampled_out' rows, so every document
    that entered the pipeline has either a survivor row or an
    attributed drop — the no-silent-drops rule the cleaning recipe
    established, carried through selection and sampling.

    Each optional stage is a semi/anti join keyed on doc_id over the
    previous stage's survivors; the composition adds no shuffle shape
    beyond its parts."""
    survivors, ledger = clean_corpus(
        docs, bench=bench, pairs=pairs, dedup_threshold=dedup_threshold
    )
    if (target is None) != (select_n is None):
        raise ValueError("DSIR selection needs BOTH target and select_n")
    if target is not None:
        from terrier_ef_spark.pipeline.dsir import dsir_sample

        picked = dsir_sample(
            survivors, target, n=select_n, buckets=dsir_buckets
        ).select("doc_id")
        dropped = survivors.join(picked, "doc_id", "left_anti").select(
            "doc_id", F.lit("dsir_rejected").alias("dropped_by")
        )
        ledger = ledger.unionByName(dropped)
        survivors = survivors.join(picked, "doc_id", "left_semi")
    if mixture_by is not None:
        from terrier_ef_spark.pipeline.sampling import mixture_sample

        kept = mixture_sample(
            survivors, by=mixture_by, temperature=temperature,
            budget_frac=budget_frac,
        ).select("doc_id")
        dropped = survivors.join(kept, "doc_id", "left_anti").select(
            "doc_id", F.lit("mixture_sampled_out").alias("dropped_by")
        )
        ledger = ledger.unionByName(dropped)
        survivors = survivors.join(kept, "doc_id", "left_semi")
    if seq_len is not None:
        from terrier_ef_spark.pipeline.chunking import pack_sequences

        return pack_sequences(survivors, seq_len=seq_len), ledger
    return survivors, ledger
