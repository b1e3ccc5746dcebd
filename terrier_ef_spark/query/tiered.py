"""Multi-tier serving with coverage fallback — the production tiered
index architecture (Risvik, Aasheim & Lidal, "Multi-tier system for
web search engines", LA-WEB 2003; the first tier every large engine
serves from): answer queries on a SMALL first tier (here the
statically pruned index, index/prune.py — per-term tf-top-N posting
lists), and fall back to the full index only for queries whose tier
page comes back SHORT (fewer than k results).

Policy note (the honest caveat every tiered stack carries): this is
COVERAGE fallback, not rank-safety. A tf-pruned tier can rank-diverge
from the full index even on a full page (a doc pruned from one term's
list loses that term's contribution); guaranteeing rank-identity
needs per-term score-bound bookkeeping the tier does not carry
(Ntoulas & Cho SIGIR'07 discuss rank-safe variants). Production tiers
accept the divergence for the tier's cost profile; so does this one,
and the contract twin models the exact same policy.

Scale shape: one term-major batch run on the tier, one bounded
per-qid count collect (len(queries) rows), one term-major run on the
full index for ONLY the fallback queries, one union. The tier run
touches tf-top-N lists (corpus-size-independent postings volume per
term); full-index work is confined to the under-covered residue."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import run_queries


def run_queries_tiered(
    tier: EFIndex,
    full: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    fallback_below: int | None = None,
) -> DataFrame:
    """Top-k with first-tier serving and full-index coverage fallback.
    Returns (qid, rank, docid, score, tier) where tier is 'pruned' or
    'full' — callers (and the contract twin) can see which path served
    each query. Queries: [{'qid', 'terms'}], disjunctive.

    fallback_below: the coverage threshold — a query falls back when
    its tier page holds fewer than this many results (default k). A
    caller fetching a DEEP page for stable re-ranking passes the
    serving page size here so the routing decision stays the page's,
    not the fetch depth's."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if fallback_below is None:
        fallback_below = k
    if not 1 <= fallback_below <= k:
        raise ValueError(
            f"fallback_below must be in [1, k]: {fallback_below} (k={k})"
        )
    if not queries:
        raise ValueError("no queries")
    for key in ("num_docs", "avgdl"):
        if tier.stats.get(key) != full.stats.get(key):
            raise ValueError(
                "tier does not derive from this full index "
                f"({key}: tier {tier.stats.get(key)} vs full "
                f"{full.stats.get(key)}) — static pruning keeps global "
                "collection statistics"
            )
    t_res = run_queries(tier, queries, k=k, strategy="term_major")
    # bounded collect of the whole tier page (<= len(queries) * k
    # rows — the PRF/cascade literal-frame discipline): the page is
    # read twice (routing counts + the served rows), and a literal
    # frame stops Spark from re-running the tier's scoring lineage
    # for the second read
    t_rows = [
        (int(r["qid"]), int(r["rank"]), int(r["docid"]), float(r["score"]))
        for r in t_res.collect()
    ]
    counts: dict[int, int] = {}
    for qid, *_ in t_rows:
        counts[qid] = counts.get(qid, 0) + 1
    fallback = [
        q for q in queries if counts.get(int(q["qid"]), 0) < fallback_below
    ]
    fb_qids = {int(q["qid"]) for q in fallback}
    spark = tier.spark
    served = spark.createDataFrame(
        [r for r in t_rows if r[0] not in fb_qids],
        "qid long, rank int, docid long, score double",
    ).withColumn("tier", F.lit("pruned"))
    if fallback:
        f_res = run_queries(full, fallback, k=k, strategy="term_major")
        return served.unionByName(f_res.withColumn("tier", F.lit("full")))
    return served
