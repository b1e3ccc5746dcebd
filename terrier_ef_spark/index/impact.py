"""Quantized impact index — score-at-index-time serving tier.

The Anserini/JASS impact-index role (Terrier's quantized index): each
posting's weighting-model contribution is computed ONCE at build time
with global collection statistics, quantized to `bits` bits, and
stored in place of the term frequency. Query-time scoring is then a
pure integer sum over matched postings — no doclen join, no idf, no
floating point — which is what makes impact indexes the cheap serving
tier for web-scale query fleets.

Quantization (Anserini's convention, floor-at-zero):

    q = 1 + floor(max(0, contrib) / gmax * (2^bits - 1))   in [1, 2^bits]

where gmax is the global maximum (6dp-rounded) contribution across the
whole index. Postings whose BM25 idf goes negative (df > N/2) floor to
the quantum minimum 1 — a documented divergence from exact BM25 (an
impact can never demote a match below the floor).

Storage reuses the EF machinery end-to-end: the docid streams are
BYTE-REUSED from the source index (never re-encoded — the merge/
compaction zero-recode property), and the quantized impacts ride the
exact freq-stream format (strict EF over the cumulative sum,
encode_freqs/decode_freqs) since impacts, like tfs, are >= 1.

Scale shape: the build is one postings decode + one docid-keyed
doclen join + one term-keyed lexicon join + a 1-row global-max
broadcast + one (term, block) re-encode — all distributed, nothing
driver-side. Query-time is one pushed-filter decode + one integer
aggregation: strictly cheaper than the exact scorer (no doclen
relation at all).

Reference: the quantized-impact design follows Anserini's
-impact/-quantization path and JASS (Lin & Trotman SIGIR'15
reproducibility line); the reference repo (tonellotto/terrier-ef)
stores exact tfs only — this tier is an addition for serving economy.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import block_upper_bound, decode_bound
from terrier_ef_spark.index.reader import EFIndex

IMPACT_FORMAT = 1


class ImpactIndex:
    """Loader for a built impact index (postings parquet + stats)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "stats.json")) as fh:
            self.stats = json.load(fh)
        if self.stats.get("impact_format") != IMPACT_FORMAT:
            raise ValueError(
                f"{root} is not an impact index (impact_format != "
                f"{IMPACT_FORMAT})"
            )

    @property
    def postings(self) -> DataFrame:
        if getattr(self, "_postings_cached", None) is not None:
            return self._postings_cached
        return self.spark.read.parquet(os.path.join(self.root, "postings"))

    def enable_serving_cache(self) -> None:
        """Pin the impact postings in Spark's in-memory columnar cache
        for a read-only serving session — the EFIndex serving-cache
        discipline (reader.py): single-topic latency on the tier is
        parquet job overhead, not decode. Distributed executor-side
        cache (spills to disk at scale), not a driver collect. The
        tier is immutable by construction (rebuilt from the source
        index, never edited in place), so there is no lifecycle-verb
        staleness caveat."""
        from pyspark import StorageLevel

        df = self.spark.read.parquet(
            os.path.join(self.root, "postings")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # materialize now, not on the first topic
        self._postings_cached = df


def build_impact_index(
    index: EFIndex,
    out: str,
    *,
    model: str = "bm25",
    bits: int = 8,
    n_partitions: int = 8,
) -> ImpactIndex:
    """Quantize `index`'s postings into an impact index at `out`.

    model: any engine weighting model usable per-posting (the
    model_contrib_expr family). bits: quantization width (impacts in
    [1, 2^bits]). The source index's docid EF blobs are carried over
    byte-identical; only the impact stream is encoded."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16]: {bits}")
    if index.deleted_docids() is not None:
        raise ValueError(
            "impact build over a tombstoned index would bake deleted "
            "docs into the serving tier; compact first"
        )
    from terrier_ef_spark.query.engine import model_contrib_expr

    spark = index.spark
    stats = index.stats
    log2q = stats["log2_quantum"]
    block_bits = stats.get("block_bits")
    num_docs = decode_bound(stats)
    levels = float((1 << bits) - 1)

    # (term, block_id, docid, tf) rows — decode_postings plus block_id,
    # which the re-encode groups on
    def decode_rows(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                f = ef.decode_freqs(bytes(r.freqs_ef), df_b, cf_b, log2q)
                yield pd.DataFrame(
                    {
                        "term": np.repeat(r.term, df_b),
                        "block_id": np.repeat(np.int64(r.block_id), df_b),
                        "docid": d,
                        "tf": f.astype(np.int64),
                    }
                )

    rows = index.postings.select(
        "term", "block_id", "df", "cf", "docids_ef", "freqs_ef"
    ).mapInPandas(
        decode_rows, schema="term string, block_id long, docid long, tf long"
    )

    contrib = model_contrib_expr(
        model,
        num_docs=float(stats["num_docs"]),
        avgdl=float(stats["avgdl"]),
        num_tokens=float(stats["num_tokens"]),
        k1=float(stats.get("k1", 1.2)),
        b=float(stats.get("b", 0.75)),
    )
    scored = (
        rows.join(index.docs.select("docid", "doclen"), "docid")
        .join(
            index.lexicon.select(
                "term",
                F.col("df").cast("double").alias("global_df"),
                F.col("cf").cast("double").alias("global_cf"),
            ),
            "term",
        )
        .select(
            "term",
            "block_id",
            "docid",
            F.greatest(F.lit(0.0), F.round(contrib, 6)).alias("c"),
        )
    )
    gmax_df = scored.agg(F.max("c").alias("gmax"))
    gmax = float(gmax_df.collect()[0]["gmax"])  # 1 scalar
    if not gmax > 0:
        raise ValueError(
            f"global max contribution is {gmax}; nothing to quantize"
        )
    quantized = scored.select(
        "term",
        "block_id",
        "docid",
        (1 + F.floor(F.col("c") / F.lit(gmax) * F.lit(levels)))
        .cast("long")
        .alias("q"),
    )

    def encode_group(key, pdf):
        order = np.argsort(pdf["docid"].to_numpy(), kind="stable")
        qs = pdf["q"].to_numpy()[order]
        sum_q = int(qs.sum())
        blob = ef.encode_freqs(qs, sum_q, log2q)
        return pd.DataFrame(
            {
                "term": [key[0]],
                "block_id": [key[1]],
                "sum_q": [sum_q],
                "impacts_ef": [blob],
            }
        )

    encoded = quantized.groupBy("term", "block_id").applyInPandas(
        encode_group,
        schema="term string, block_id long, sum_q long, impacts_ef binary",
    )
    carried = index.postings.select(
        "term", "block_id", "df", "first_docid", "last_docid", "docids_ef"
    )
    result = carried.join(encoded, ["term", "block_id"])
    os.makedirs(out, exist_ok=True)
    (
        result.repartitionByRange(n_partitions, "term", "block_id")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "postings"))
    )
    out_stats = {
        "impact_format": IMPACT_FORMAT,
        "impact_model": model,
        "impact_bits": bits,
        "impact_gmax": gmax,
        "num_docs": stats["num_docs"],
        "docid_bound": num_docs,
        "num_terms": stats["num_terms"],
        "num_postings": stats["num_postings"],
        "log2_quantum": log2q,
        "block_bits": block_bits,
    }
    tmp = os.path.join(out, "stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(out_stats, fh, indent=2)
    os.replace(tmp, os.path.join(out, "stats.json"))
    return ImpactIndex(spark, out)


def decode_impacts(
    impact: ImpactIndex, terms: list[str] | None = None
) -> DataFrame:
    """Decode to (term, docid, impact) rows — the impact-tier twin of
    engine.decode_postings; with `terms` the filter is pushed to the
    term-range-sorted parquet."""
    stats = impact.stats
    log2q = stats["log2_quantum"]
    block_bits = stats.get("block_bits")
    num_docs = int(stats["docid_bound"])

    src = impact.postings
    if terms is not None:
        src = src.where(F.col("term").isin(sorted(set(terms))))

    def decode_rows(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                df_b, sq = int(r.df), int(r.sum_q)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                q = ef.decode_freqs(bytes(r.impacts_ef), df_b, sq, log2q)
                yield pd.DataFrame(
                    {
                        "term": np.repeat(r.term, df_b),
                        "docid": d,
                        "impact": q.astype(np.int64),
                    }
                )

    cols = ["term", "block_id", "df", "sum_q", "docids_ef", "impacts_ef"]
    return src.select(cols).mapInPandas(
        decode_rows, schema="term string, docid long, impact long"
    )


def run_queries_impact(
    impact: ImpactIndex, queries: list[dict], *, k: int = 10
) -> DataFrame:
    """Impact-scored disjunctive top-k: score(q, d) = sum of the
    matched terms' quantized impacts (integer arithmetic, no doclen /
    idf / stats relation at query time). queries: [{'qid', 'terms'}].
    Returns (qid, rank, docid, score) with integer scores; ties break
    docid asc."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    pairs = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not pairs:
        raise ValueError("no query terms")
    qterms = impact.spark.createDataFrame(pairs, "qid long, term string")
    terms = sorted({t for _, t in pairs})
    scored = (
        decode_impacts(impact, terms)
        .join(F.broadcast(qterms), "term")
        .groupBy("qid", "docid")
        .agg(F.sum("impact").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
