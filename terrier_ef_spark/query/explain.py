"""Score explanation — the Lucene `Explanation` / Terrier debugging
role: for chosen (qid, docid) pairs, the per-term evidence behind the
score (tf, doclen, df, cf, and the term's weighting-model
contribution), so a ranking can be audited term by term.

Relational shape: one pushed-filter postings decode for the batch's
term union (the term-major scorer's decode stage), one broadcast
(qid, term) fanout, one broadcast semi-join to the requested pairs
(pairs are user-chosen — a handful of rows), then the same lexicon +
doclen joins and the SAME model_contrib_expr the scorer itself uses —
an explanation is trustworthy only if it shares the scorer's
arithmetic, so it does, literally."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.engine import decode_postings, model_contrib_expr


def explain_scores(
    index: EFIndex,
    queries: list[dict],
    pairs: list[tuple[int, int]],
    *,
    model: str = "bm25",
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """Per-term score evidence for the given (qid, docid) pairs.
    Returns (qid, docid, term, tf, doclen, df, cf, contrib) — one row
    per query term PRESENT in the doc, contrib rounded 6dp; the pair's
    score is the sum of its contribs (disjunctive semantics; query
    weights are not applied — the evidence is per-occurrence)."""
    if not pairs:
        raise ValueError("no (qid, docid) pairs to explain")
    qrows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    if not qrows:
        raise ValueError("no query terms")
    known = {qid for qid, _ in qrows}
    bad = [p for p in pairs if int(p[0]) not in known]
    if bad:
        raise ValueError(f"pairs reference unknown qids: {bad}")
    if k1 is None:
        k1 = float(index.stats.get("k1", bm25.K1))
    if b is None:
        b = float(index.stats.get("b", bm25.B))
    spark = index.spark
    terms = sorted({t for _, t in qrows})
    qt = spark.createDataFrame(qrows, "qid long, term string")
    pr = spark.createDataFrame(
        [(int(a), int(d)) for a, d in pairs], "qid long, docid long"
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
    rows = (
        decode_postings(index, terms=terms)
        .join(F.broadcast(qt), "term")
        .join(F.broadcast(pr), ["qid", "docid"], "left_semi")
        .join(F.broadcast(lex), "term")
    )
    rows = index.docs.select("docid", "doclen").join(F.broadcast(rows), "docid")
    contrib = model_contrib_expr(
        model, num_docs=num_docs, avgdl=avgdl, num_tokens=num_tokens,
        k1=k1, b=b,
    )
    return rows.select(
        "qid",
        "docid",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("doclen").cast("long").alias("doclen"),
        F.col("global_df").cast("long").alias("df"),
        F.col("global_cf").cast("long").alias("cf"),
        F.round(contrib, 6).alias("contrib"),
    )
