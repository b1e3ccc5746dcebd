"""Two-stage cascade (telescoping) retrieval: quantized impact tier
first pass -> exact weighting-model re-rank of its candidates.

The multi-stage serving architecture of Wang, Lin & Metzler (SIGIR'11,
"A cascade ranking model for efficient ranked retrieval") as deployed
by the JASS/Anserini impact-ordered stacks: stage 1 answers on the
integer impact index (index/impact.py — no doclen relation, no
floating point) to select a bounded per-query candidate pool of
`depth` docids; stage 2 re-scores ONLY those (qid, docid) pairs with
the exact global-statistics weighting model, so the expensive exact
pass touches at most len(queries) * depth documents instead of the
full match set. The reference (tonellotto/terrier-ef) serves a single
exact tier — the cascade composes our quantized tier with the exact
term-major scorer's relational pipeline (engine.model_contrib_expr).

Exactness caveat (inherent to every impact cascade): stage 1 ranks by
quantized score, so the candidate pool can differ from the exact
model's own top-`depth`; documents the quantizer under-ranks past the
depth cut are unrecoverable in stage 2. depth is the standard
efficiency/effectiveness knob (Anserini's -hits for the first stage).

100 TB shape: stage 1 is the impact scorer's single pushed-filter
decode + one integer aggregation. Its winners — the only
driver-bounded state, <= len(queries) * depth rows, the PRF
pipeline's bounded-collect discipline — come back as literal frames,
so stage 2's plan never recomputes stage 1's lineage. Stage 2 decodes
the batch's term union ONCE with the term-major scorer's measured
per-term policy (whole-list kernel decode vs candidate-selective
quanta decode, the same TERM_MAJOR_SELECTIVE_QUANTA_FACTOR cutover:
a hot term's list is only probed at the candidate docids), restricts
to the candidate pairs with one broadcast semi-join BEFORE the doclen
join and score fold, and finishes with one aggregation and one per-qid
window. No self-joins, no driver iteration beyond the bounded
candidate collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.impact import ImpactIndex, run_queries_impact
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.engine import (
    RESULT_SCHEMA,
    TERM_MAJOR_SELECTIVE_QUANTA_FACTOR,
    decode_postings,
    decode_postings_selective,
    model_contrib_expr,
)


def run_queries_cascade(
    impact: ImpactIndex,
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    depth: int = 100,
    model: str = "bm25",
    k1: float | None = None,
    b: float | None = None,
    selective: bool | None = None,
) -> DataFrame:
    """Disjunctive top-k through the two-stage cascade.

    queries: [{'qid', 'terms'}] (disjunctive; repeated terms dedup to
    weight 1, as in run_queries_impact — the first stage has no qtf
    channel). depth: stage-1 candidate pool per query (>= k). model /
    k1 / b: the exact stage-2 weighting model. selective: force the
    stage-2 decode policy (True = candidate-selective quanta decode,
    False = whole-list), None = the measured per-term cutover.

    Returns (qid, rank, docid, score) with stage-2 exact scores; ties
    break docid asc. Tombstones on `index` are honored even when the
    (immutable, tombstone-free by construction) tier still surfaces
    the docids: deleted candidates are dropped, not backfilled.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if depth < k:
        raise ValueError(f"depth must be >= k: depth={depth} k={k}")
    # parameter resolution mirrors run_queries: explicit args win, else
    # the values recorded at build time (which also quantized the
    # tier), else the module defaults — a tuned build cascades
    # consistently with zero caller changes
    if k1 is None:
        k1 = float(index.stats.get("k1", bm25.K1))
    if b is None:
        b = float(index.stats.get("b", bm25.B))
    for key in ("num_docs", "num_postings"):
        if int(impact.stats[key]) != int(index.stats[key]):
            raise ValueError(
                f"impact tier does not derive from this index "
                f"({key}: tier {impact.stats[key]} vs index "
                f"{index.stats[key]})"
            )
    pairs = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not pairs:
        raise ValueError("no query terms")
    spark = index.spark

    # ---- stage 1: integer first pass on the tier -------------------
    cand = run_queries_impact(impact, queries, k=depth).select("qid", "docid")
    deleted = index.deleted_docids()
    if deleted is not None:
        cand = cand.join(deleted.select("docid"), "docid", "left_anti")
    # bounded collect (<= len(queries) * depth rows): stage 2 reuses
    # the winners twice (decode routing + the scoring semi-join) —
    # literal frames stop Spark from re-running stage 1's lineage
    cand_rows = [(int(r["qid"]), int(r["docid"])) for r in cand.collect()]
    if not cand_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    cand_by_qid: dict[int, list[int]] = {}
    for qid, d in cand_rows:
        cand_by_qid.setdefault(qid, []).append(d)

    # ---- stage 2 decode: per-term whole-list vs selective ----------
    terms = sorted({t for _, t in pairs})
    df_by_term = {
        r["term"]: int(r["df"])
        for r in index.lexicon.select("term", "df")
        .where(F.col("term").isin(terms))
        .collect()
    }
    log2q = int(index.stats["log2_quantum"])
    # candidates for term t = the pooled winners of t's queries; each
    # scattered candidate decodes ~1 quantum, so selective pays while
    # candidate quanta stay under 1/FACTOR of the term's quanta (the
    # term-major conjunctive path's measured break-even)
    cand_bound = {
        t: sum(
            len(cand_by_qid.get(qid, ()))
            for qid, t2 in pairs
            if t2 == t
        )
        for t in terms
    }

    def _pick_selective(t: str) -> bool:
        if t not in df_by_term:
            return False  # absent from the lexicon: no rows either way
        if selective is not None:
            return selective
        return (
            cand_bound[t] * TERM_MAJOR_SELECTIVE_QUANTA_FACTOR
            < (df_by_term[t] >> log2q)
        )

    sel_terms = sorted(t for t in terms if _pick_selective(t))
    full_terms = sorted(set(terms) - set(sel_terms))
    posts = None
    if full_terms:
        posts = decode_postings(index, terms=full_terms)
    if sel_terms:
        sel_set = set(sel_terms)
        td = sorted(
            {
                (t, d)
                for qid, t in pairs
                if t in sel_set
                for d in cand_by_qid.get(qid, ())
            }
        )
        cand_td = spark.createDataFrame(td, "term string, docid long")
        posts_sel = decode_postings_selective(index, cand_td, terms=sel_terms)
        posts = posts.unionByName(posts_sel) if posts is not None else posts_sel
    if posts is None:
        return spark.createDataFrame([], RESULT_SCHEMA)

    # ---- stage 2 scoring: restrict, join stats, fold, rank ---------
    qterms_df = spark.createDataFrame(pairs, "qid long, term string")
    cand_df = spark.createDataFrame(cand_rows, "qid long, docid long")
    rows = (
        posts.join(F.broadcast(qterms_df), "term")
        .join(F.broadcast(cand_df), ["qid", "docid"], "left_semi")
    )
    stats = index.stats
    num_docs = float(stats["num_docs"])
    avgdl = float(stats["avgdl"])
    num_tokens = float(stats.get("num_tokens") or (num_docs * avgdl))
    lex = index.lexicon.select(
        "term",
        F.col("df").cast("double").alias("global_df"),
        F.col("cf").cast("double").alias("global_cf"),
    ).where(F.col("term").isin(terms))
    rows = rows.join(F.broadcast(lex), "term")
    # candidate rows are broker-sized — broadcast THEM into the docs
    # table (the reverse of the exhaustive scorer's partitioned doclen
    # join, where the posting side dominates)
    rows = index.docs.select("docid", "doclen").join(
        F.broadcast(rows), "docid"
    )
    contrib = model_contrib_expr(
        model, num_docs=num_docs, avgdl=avgdl, num_tokens=num_tokens,
        k1=k1, b=b,
    )
    scored = (
        rows.select("qid", "docid", contrib.alias("contrib"))
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
