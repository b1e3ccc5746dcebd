"""BM25F — fielded retrieval over per-field EF indexes.

The reference's Terrier host ships BM25F (Zaragoza et al., CIKM 2004
"Microsoft Cambridge at TREC-13"): term frequencies are normalized PER
FIELD (title, body, anchor — here e.g. path vs content of a source
file), weighted, SUMMED, and the combined pseudo-frequency goes through
one BM25 saturation. Matching in a short title is worth far more than
matching in a long body, which per-field-independent BM25 sums get
wrong (double saturation).

    tfn_f = tf_f / (1 + b_f * (dl_f / avgdl_f - 1))      per field
    tfn   = sum_f w_f * tfn_f
    score = sum_t idf(t) * tfn / (k1 + tfn)
    idf(t) = log2((N - df + 0.5) / (df + 0.5)),  df = |{d : t in ANY field of d}|

Engine shape (all Catalyst, scale-clean): each field is its own EF
index over the SAME docid space (fields compress independently — a
path field is tiny next to content). Per-field decode is the standard
pushed-isin postings scan; field rows union; the combined df is a
countDistinct over that union (never a driver set); doclen joins are
per-field partitioned joins. One groupBy(term, docid) folds the field
fan-in, one groupBy(qid, docid) folds the query fan-in — same two
shuffles as the single-field term-major scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.engine import RESULT_SCHEMA, decode_postings


def run_queries_bm25f(
    fields: dict[str, EFIndex],
    queries: list[dict],
    *,
    k: int = 10,
    weights: dict[str, float] | None = None,
    bs: dict[str, float] | None = None,
    k1: float = bm25.K1,
    respect_deletes: bool = True,
) -> DataFrame:
    """fields: {field_name: EFIndex} built over the SAME docid space
    (each index's docs table must cover the same docids; per-field
    doclens naturally differ). queries: [{'qid', 'terms'}] (disjunctive).
    weights: per-field w_f (default 1.0); bs: per-field b (default
    bm25.B). Returns (qid, rank, docid, score)."""
    if not fields:
        raise ValueError("bm25f needs at least one field index")
    names = sorted(fields)
    spark = fields[names[0]].spark
    num_docs = float(fields[names[0]].stats["num_docs"])
    for n in names[1:]:
        if float(fields[n].stats["num_docs"]) != num_docs:
            raise ValueError(
                "field indexes disagree on num_docs — they must be built "
                "over the same docid space"
            )
    weights = weights or {}
    bs = bs or {}

    qterm_rows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not qterm_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    terms = sorted({t for _, t in qterm_rows})
    qterms_df = spark.createDataFrame(qterm_rows, "qid long, term string")

    parts = []
    for name in names:
        idx = fields[name]
        w = float(weights.get(name, 1.0))
        b = float(bs.get(name, bm25.B))
        avgdl = float(idx.stats["avgdl"])
        rows = decode_postings(idx, terms).join(
            idx.docs.select("docid", "doclen"), "docid"
        )
        tf = F.col("tf").cast("double")
        dl = F.col("doclen").cast("double")
        tfn = tf / (1 + F.lit(b) * (dl / F.lit(avgdl) - 1))
        parts.append(rows.select(
            "term", "docid", (F.lit(w) * tfn).alias("wtfn")
        ))
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)

    # one shuffle folds the field fan-in AND yields the combined df:
    # count of distinct docids per term == rows per term after this
    # groupBy, so df is a window count over the aggregated relation
    # (no second scan, no driver set)
    folded = uni.groupBy("term", "docid").agg(F.sum("wtfn").alias("tfn"))
    folded = folded.withColumn(
        "global_df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    idf = F.log2(
        (F.lit(num_docs) - F.col("global_df") + 0.5)
        / (F.col("global_df") + 0.5)
    )
    contrib = idf * F.col("tfn") / (F.lit(k1) + F.col("tfn"))
    scored = (
        folded.select("term", "docid", contrib.alias("contrib"))
        .join(F.broadcast(qterms_df), "term")
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("score"))
    )
    # tombstone semantics match the single-field scorer: a doc deleted
    # in ANY field index is excluded from results, while df/idf stay
    # global until compaction (the anti-join sits after the df window)
    if respect_deletes:
        tombs = [t for t in (fields[n].deleted_docids() for n in names)
                 if t is not None]
        if tombs:
            tomb = tombs[0].select("docid")
            for t in tombs[1:]:
                tomb = tomb.unionByName(t.select("docid"))
            scored = scored.join(tomb.distinct(), "docid", "left_anti")
    wnd = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
