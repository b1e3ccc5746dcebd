"""Percolation — reverse search: match STORED QUERIES against a
document stream (the Elasticsearch percolator role; Terrier/Lucene
have no equivalent, but every alerting / routing / topic-subscription
deployment needs it: "which saved searches does this new document
satisfy?").

Model: queries are rows (qid, terms, mode) exactly like the forward
engine's batches — disjunctive (any term matches) or conjunctive (all
terms must appear). Documents are any (doc_id, text) relation — an
incoming micro-batch, a backfill, a full corpus.

Relational shape (the forward scorer's plan transposed): tokenize the
documents ONCE (distinct (doc_id, term) pairs — presence, not tf),
semi-restrict to the query vocabulary (a broadcast of the stored
queries' term union — stored-query sets are broker-sized by
construction, thousands of terms), broadcast-join the (qid, term)
pairs, fold to per-(qid, doc) distinct-term hit counts, and keep
disjunctive hits or conjunctive full-coverage rows. One shuffle (the
fold); the document relation is never joined to itself and never
leaves the cluster. At 100 TB of incoming docs this is a map-side
vocabulary filter followed by one aggregation — the same cost class
as token counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.tokenizer import tokenize_expr


def percolate(
    docs: DataFrame,
    queries: list[dict],
) -> DataFrame:
    """Match every document against every stored query. queries:
    [{'qid', 'terms', 'mode': 'disjunctive'|'conjunctive'}] (mode
    defaults to disjunctive; repeated terms dedup — percolation is
    presence, not scoring). Returns (qid, doc_id, n_hit) where n_hit
    is the count of distinct query terms present in the doc; for
    conjunctive queries n_hit always equals the query's term count."""
    rows = []
    n_terms: dict[int, int] = {}
    modes: dict[int, str] = {}
    for q in queries:
        qid = int(q["qid"])
        terms = list(dict.fromkeys(q["terms"]))
        if not terms:
            raise ValueError(f"query {qid} has no terms")
        mode = q.get("mode") or "disjunctive"
        if mode not in ("disjunctive", "conjunctive"):
            raise ValueError(f"query {qid}: unknown mode {mode!r}")
        if qid in n_terms:
            raise ValueError(f"duplicate qid {qid}")
        n_terms[qid] = len(terms)
        modes[qid] = mode
        rows.extend((qid, t) for t in terms)
    if not rows:
        raise ValueError("no stored queries")
    spark = docs.sparkSession
    qt = spark.createDataFrame(rows, "qid long, term string")
    vocab = sorted({t for _, t in rows})
    meta = spark.createDataFrame(
        [(qid, n_terms[qid], modes[qid]) for qid in sorted(n_terms)],
        "qid long, n_terms int, mode string",
    )
    present = (
        docs.select(
            "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term")
        )
        .where(F.col("term").isin(vocab))  # map-side vocabulary filter
        .distinct()
    )
    hits = (
        present.join(F.broadcast(qt), "term")
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(meta), "qid")
        .where(
            (F.col("mode") == "disjunctive")
            | (F.col("n_hit") == F.col("n_terms"))
        )
        .select("qid", "doc_id", "n_hit")
    )


def percolate_sql(queries, tok_sql: str) -> str:
    """DuckDB twin of percolate over the documents table. tok_sql: the
    tokenizer's SQL twin expression over `text`."""
    vals = ", ".join(
        f"({int(q['qid'])}, '{t}')"
        for q in queries
        for t in dict.fromkeys(q["terms"])
    )
    meta = ", ".join(
        f"({int(q['qid'])}, {len(dict.fromkeys(q['terms']))},"
        f" '{q.get('mode') or 'disjunctive'}')"
        for q in queries
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({tok_sql}) AS term FROM documents
  )
), q(qid, term) AS (VALUES {vals}),
meta(qid, n_terms, mode) AS (VALUES {meta}),
hits AS (
  SELECT q.qid, tok.doc_id, count(*)::bigint AS n_hit
  FROM q JOIN tok USING (term) GROUP BY 1, 2
)
SELECT h.qid::bigint AS qid, h.doc_id, h.n_hit
FROM hits h JOIN meta m ON m.qid = h.qid
WHERE m.mode = 'disjunctive' OR h.n_hit = m.n_terms
"""
