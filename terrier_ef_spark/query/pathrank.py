"""Path / filename match ranking over the source-code corpus — the
other half of Zoekt's ranking signal next to symbols (query/symbols.py).

Code-search engines rank a match on the file PATH above an ordinary
body match ("users type the filename they remember"), and return
filename-only hits even when the content contains none of the query
terms. The index here covers content only (terrier-ef's model), so the
path signal is a relational side-channel over the corpus metadata
relation (doc_id, path) — the same (repo, path, ...) input-hint shape
the build consumed:

  path_term_pairs:  tokenize `path` with the same fold the content
                    tokenizer uses ([^a-z0-9]+ split, lowercase) and
                    count DISTINCT query terms appearing among a doc's
                    path tokens -> (qid, docid, boost). Map-only over
                    the metadata relation (orders of magnitude smaller
                    than content) + one bounded fold.
  run_queries_path_boost: BM25 + beta x |path-matched terms|, joined
                    FULL OUTER onto the folded scores (engine
                    boost_unmatched channel): a doc whose path matches
                    ranks even with ZERO content hits — score = boost,
                    exactly Zoekt's filename-only result class. The
                    engine re-binds doc_filter / tombstones on the
                    entering rows, so filtered or deleted docs cannot
                    sneak in through their filename.
  path_search:      pure filename lookup (no BM25): documents ranked
                    by |matched path terms| with the deterministic
                    (docid asc) page tie-break.

Both surfaces are exact at any k: the boost lands before top-k
truncation, never as a re-rank of a fixed page.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

__all__ = [
    "PATH_SPLIT_RE",
    "path_term_pairs",
    "run_queries_path_boost",
    "path_search",
]

# the same fold the simple content tokenizer applies — path tokens and
# query terms must meet in one normalization space. Identical under
# Java regex and RE2 (the oracle-twin constraint).
PATH_SPLIT_RE = "[^a-z0-9]+"


def _path_tokens(path_col):
    return F.array_remove(
        F.split(F.lower(path_col), PATH_SPLIT_RE), ""
    )


def path_term_pairs(
    meta: DataFrame,
    queries: list[dict],
    *,
    beta: float = 1.0,
    path_col: str = "path",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, docid, boost): boost = beta x |distinct query terms among
    the doc's path tokens|. meta is the metadata relation (doc_id,
    path) — never the content. One map-side explode of ~path-depth
    tokens per doc, a literal isin restriction pushed into the scan,
    and one bounded fold; no self-joins."""
    spark = meta.sparkSession
    rows = sorted(
        {(int(q["qid"]), t) for q in queries for t in q["terms"]}
    )
    qdf = spark.createDataFrame(rows, "qid long, term string")
    terms = sorted({t for _, t in rows})
    toks = (
        meta.select(
            F.col(id_col).alias("docid"),
            F.explode(F.array_distinct(_path_tokens(F.col(path_col)))).alias(
                "ptok"
            ),
        )
        # restrict before the fold: only query-term tokens matter
        .where(F.col("ptok").isin(terms))
    )
    return (
        toks.join(F.broadcast(qdf), F.col("ptok") == F.col("term"))
        .groupBy("qid", "docid")
        .agg((F.countDistinct("term") * F.lit(float(beta))).alias("boost"))
    )


def run_queries_path_boost(
    index,
    meta: DataFrame,
    queries: list[dict],
    *,
    k: int = 10,
    beta: float = 1.0,
    **kwargs,
) -> DataFrame:
    """BM25 with filename-match boosting:
    score(q, d) = BM25(q, d) + beta x |{t in q : t in path_tokens(d)}|,
    where BM25(q, d) = 0 for docs with no content match — such docs
    still enter the page when their path matches (the Zoekt
    filename-only result class; engine boost_unmatched=True).
    Conjunctive queries keep their all-terms content requirement (the
    nhit filter drops boost-only rows)."""
    from .engine import run_queries

    bp = path_term_pairs(meta, queries, beta=beta)
    return run_queries(
        index, queries, k=k, boost_pairs=bp, boost_unmatched=True, **kwargs
    )


def path_search(
    meta: DataFrame,
    queries: list[dict],
    *,
    k: int = 10,
    path_col: str = "path",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pure filename search: rank documents by how many query terms
    appear among their path tokens (n_hits desc, docid asc, top k).
    Returns (qid, rank, docid, n_hits)."""
    pairs = path_term_pairs(
        meta, queries, beta=1.0, path_col=path_col, id_col=id_col
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("n_hits"), F.asc("docid")
    )
    return (
        pairs.select(
            "qid", "docid", F.col("boost").cast("long").alias("n_hits")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "n_hits")
    )
