"""Repository-level result ranking: aggregate a document ranking into
a ranking of REPOSITORIES — the "group results by repo" serving mode
code-search platforms expose (Sourcegraph's repo search / GitHub's
grouped results), and the retrieval twin of collapse_top_k: collapsing
caps what one group may contribute to a document page; repo ranking
makes the group itself the result unit.

Semantics (the production convention): a repository's score for a
query is an aggregate of its documents' scores within the query's
deep top-`depth` page — `sum` over its best `per_repo` documents
(evidence accumulates across files, but a bound keeps one giant
monorepo from dominating through sheer file count), or `max` (a
repo is as good as its best file). Aggregating the served page, not
the full matched set, is what every grouped-serving implementation
does: the page IS the retrieval result, and the 6dp-stable deep cut
makes the input deterministic.

Scale shape: one join of the (queries x depth)-row ranked list
against the docid->repo column (Catalyst broadcasts the ranked side
into the mapping scan), one bounded per-(qid, repo) window, one fold
to at most (queries x depth) repo rows, one per-qid top-k window —
broker-sized end to end, no self-joins, corpus touched only through
the docid->repo mapping column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["repo_rank_top_k"]


def repo_rank_top_k(
    results: DataFrame,
    doc_repos: DataFrame,
    *,
    k: int = 10,
    per_repo: int | None = 3,
    agg: str = "sum",
) -> DataFrame:
    """Rank repositories from a ranked document list.

    results: (qid, rank, docid, score) — rank unique per qid, scores
    6dp-rounded (every engine entry point emits this shape).
    doc_repos: (docid, repo), one row per docid. A docid missing from
    the mapping carries no repo identity and is dropped (a grouped
    page can only show groups).

    Repo score = `agg` of the repo's document scores on the page,
    restricted to its best `per_repo` documents by rank
    (per_repo=None uses every page document). Returns
    (qid, rank, repo, score, n_docs, best_docid): n_docs = page
    documents that CONTRIBUTED (post per_repo cut), best_docid = the
    repo's best-ranked contributing document — the drill-in anchor.
    Rank by (score desc, best page rank asc, repo asc); score is
    re-rounded to 6dp so the cross-engine float-sum discipline holds.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if per_repo is not None and per_repo < 1:
        raise ValueError(f"need per_repo >= 1 or None, got {per_repo}")
    if agg not in ("sum", "max"):
        raise ValueError(f"agg must be 'sum' or 'max', got {agg!r}")

    j = results.join(doc_repos.select("docid", "repo"), "docid")
    if per_repo is not None:
        w_r = Window.partitionBy("qid", "repo").orderBy(F.asc("rank"))
        j = (
            j.withColumn("_rr", F.row_number().over(w_r))
            .where(F.col("_rr") <= per_repo)
            .drop("_rr")
        )
    score = (
        F.round(F.sum("score"), 6) if agg == "sum" else F.max("score")
    )
    folded = j.groupBy("qid", "repo").agg(
        score.alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("rank").alias("_best_rank"),
        F.min_by("docid", "rank").alias("best_docid"),
    )
    w_q = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("_best_rank"), F.asc("repo")
    )
    return (
        folded.withColumn("rank", F.row_number().over(w_q))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "repo", "score", "n_docs", "best_docid")
    )
