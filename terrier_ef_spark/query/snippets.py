"""Snippet (best-window) extraction over the positions index —
Terrier's result-summarisation role (org.terrier.querying.summarisation),
re-expressed on the EF block index: for each (query, result doc), find
the token window of width W containing the most distinct query terms
(tie-break: earliest window).

Spark-first shape: the result set is tiny (queries x k docs), so
positions are decoded SELECTIVELY — only the result docs' posting
segments for the query's terms are unpacked (the same candidate-routed
kernel the phrase operator uses; a hot term's position blob is never
unpacked wholesale). Window scoring is a bounded range self-join per
(qid, docid) group: anchors are query-term occurrences, so the join
fan-out is occurrences^2 within one doc, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_positions_selective

WINDOW = 10


def best_windows(
    index: EFIndex,
    queries: list[dict],
    results: DataFrame,
    *,
    window: int = WINDOW,
) -> DataFrame:
    """(qid, docid, start, n_terms): the best snippet window per result
    doc. `results` carries (qid, docid) — typically run_queries output.
    start is the 0-based token offset of the window [start, start+window);
    n_terms the distinct query terms inside it. Result docs with no
    indexed query-term position (cannot happen for docs the scorer
    returned) are absent."""
    spark = index.spark
    qterms = spark.createDataFrame(
        [(int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])],
        "qid long, term string",
    )
    res = results.select("qid", "docid")
    # decode probe: (term, docid) pairs restricted to each query's docs
    cand = res.join(F.broadcast(qterms), "qid").select("term", "docid").distinct()
    terms = sorted({t for q in queries for t in q["terms"]})
    pos = decode_positions_selective(index, cand, terms)
    # re-attach qid (a doc may serve several queries with different terms)
    qpos = (
        pos.join(F.broadcast(qterms), "term")
        .join(res, ["qid", "docid"])
        .select("qid", "docid", "term", "pos")
    )
    anchors = qpos.select("qid", "docid", F.col("pos").alias("start")).distinct()
    hits = anchors.join(
        qpos.select("qid", "docid", "term", F.col("pos").alias("p")),
        ["qid", "docid"],
    ).where((F.col("p") >= F.col("start")) & (F.col("p") < F.col("start") + window))
    scored = hits.groupBy("qid", "docid", "start").agg(
        F.count_distinct("term").alias("n_terms")
    )
    w = Window.partitionBy("qid", "docid").orderBy(
        F.desc("n_terms"), F.asc("start")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("qid", "docid", "start", F.col("n_terms").cast("long").alias("n_terms"))
    )


def best_windows_sql(
    queries: list[dict],
    tok_sql: str,
    contrib_sql: str,
    window: int = WINDOW,
    k: int = 10,
) -> str:
    """DuckDB twin: BM25 top-k per query (6dp/docid selection, the
    engines' shared rerank contract), token positions via
    unnest(range()), identical anchor-window scoring. `tok_sql` is the
    tokenizer expression over documents.text (entry TOK); `contrib_sql`
    the shared per-posting BM25 contribution (entry _MODEL_CONTRIB_SQL,
    aliases st/l/p/dl)."""
    vals = ", ".join(
        f"({q['qid']}, '{t}')" for q in queries for t in dict.fromkeys(q["terms"])
    )
    return f"""
WITH t AS (
  SELECT doc_id, {tok_sql} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS term FROM t
), post AS (
  SELECT term, doc_id, count(*)::double AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::double AS doclen FROM tok GROUP BY 1
), st AS (
  SELECT (SELECT count(*) FROM documents)::double AS n, avg(doclen) AS avgdl
  FROM dl
), lex AS (
  SELECT term, count(*)::double AS df FROM post GROUP BY 1
), q(qid, term) AS (VALUES {vals}),
sc AS (
  SELECT q.qid, p.doc_id AS docid, sum({contrib_sql}) AS score
  FROM q JOIN lex l USING (term) JOIN post p USING (term)
       JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN st
  GROUP BY 1, 2
), res AS (
  SELECT qid, docid FROM (
    SELECT qid, docid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round(score, 6) DESC, docid ASC) AS rk
    FROM sc
  ) WHERE rk <= {k}
), posr AS (
  SELECT t.doc_id AS docid, i AS pos, toks[i + 1] AS term
  FROM t, unnest(range(len(toks))) AS u(i)
), qpos AS (
  SELECT res.qid, res.docid, posr.term, posr.pos
  FROM res JOIN posr ON posr.docid = res.docid
       JOIN q ON q.qid = res.qid AND q.term = posr.term
), anchors AS (
  SELECT DISTINCT qid, docid, pos AS start FROM qpos
), scored AS (
  SELECT a.qid, a.docid, a.start, count(DISTINCT p.term) AS n_terms
  FROM anchors a JOIN qpos p
       ON p.qid = a.qid AND p.docid = a.docid
      AND p.pos >= a.start AND p.pos < a.start + {window}
  GROUP BY 1, 2, 3
)
SELECT qid, docid, start, n_terms::bigint AS n_terms FROM (
  SELECT qid, docid, start, n_terms,
         row_number() OVER (PARTITION BY qid, docid
                            ORDER BY n_terms DESC, start ASC) AS rk
  FROM scored
) WHERE rk = 1
"""
