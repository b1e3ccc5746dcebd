"""Hybrid lexical + semantic retrieval via Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009): for each candidate id,
fused(id) = sum over input lists of 1 / (k_rrf + rank_in_list), with
absent-from-list contributing 0. Rank-only fusion needs no score
normalization and no global statistics, which is what makes it the
standard fusion for web-scale hybrid retrieval pipelines (BM25 index
scan + ANN): each input list is an independent top-`depth` retrieval
produced by an engine that already scales (term-major EF/BM25 scoring,
bucketed/IVF ANN), and the fusion itself touches only
`depth x n_lists` rows per query — a union + one tiny groupBy, never
the corpus.

Determinism contract (mirrors the DuckDB oracle twin): input ranks are
integers, each contribution 1/(k_rrf+rank) is one double division, and
a two-list fusion sums exactly two doubles (commutative, so partial
aggregation order cannot change the result). For >2 lists the fused
score is rounded to 9dp before ranking so accumulation order can never
reorder ties across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K_RRF = 60  # the constant from the RRF paper


def rrf_fuse(
    lists: list[DataFrame], *, k: int = 10, k_rrf: int = DEFAULT_K_RRF
) -> DataFrame:
    """Fuse ranked lists, each with columns (id, rank), into a top-k
    (id, rrf_score, rank). rank is 1-based in inputs and output;
    output tie-break (rrf_score desc, id asc).

    Plan shape: unionByName over the (already tiny) per-list top-depth
    frames -> groupBy(id).sum -> distributed TakeOrdered(k) -> a
    <=k-row ranking window. Nothing here scales with corpus size."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contrib = [
        df.select(
            F.col("id").alias("id"),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias(
                "contrib"
            ),
        )
        for df in lists
    ]
    u = contrib[0]
    for c in contrib[1:]:
        u = u.unionByName(c)
    fused = u.groupBy("id").agg(F.round(F.sum("contrib"), 9).alias("rrf_score"))
    top = fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id", "rrf_score", "rank"
    )


def normalize_scores(
    scored: DataFrame, method: str = "minmax",
    score_col: str = "score", id_col: str = "id",
) -> DataFrame:
    """Per-list score normalization for comb fusion (Lee, SIGIR 1997):
    (id, nscore). 'minmax' -> (s - min)/(max - min) in [0, 1], with a
    degenerate (constant-score) list mapping to 1.0; 'zscore' ->
    (s - mean)/stddev_pop, degenerate list to 0.0; 'none' passes the
    raw scores through (Fox & Shaw's original unnormalized comb).

    Determinism: inputs are the depth-cut top lists whose scores are
    already 6dp-rounded by the callers, and minmax uses only min/max
    (order-independent exactly), so minmax-normalized values are pure
    per-row functions — safe for cross-engine twins. zscore sums
    doubles (accumulation-order sensitive in the last ulp), fine for
    ranking, not pinned by a hash oracle."""
    if method == "none":
        return scored.select(F.col(id_col).alias("id"),
                             F.col(score_col).cast("double").alias("nscore"))
    s = F.col(score_col).cast("double")
    if method == "minmax":
        lo, hi = F.min(s), F.max(s)
        stats = scored.agg(lo.alias("lo"), hi.alias("hi"))
        return scored.crossJoin(F.broadcast(stats)).select(
            F.col(id_col).alias("id"),
            F.when(F.col("hi") == F.col("lo"), F.lit(1.0))
            .otherwise((s - F.col("lo")) / (F.col("hi") - F.col("lo")))
            .alias("nscore"),
        )
    if method == "zscore":
        stats = scored.agg(
            F.avg(s).alias("mu"), F.stddev_pop(s).alias("sd")
        )
        return scored.crossJoin(F.broadcast(stats)).select(
            F.col(id_col).alias("id"),
            F.when(F.col("sd") == 0.0, F.lit(0.0))
            .otherwise((s - F.col("mu")) / F.col("sd"))
            .alias("nscore"),
        )
    raise ValueError(f"unknown normalization {method!r}")


def comb_fuse(
    lists: list[DataFrame],
    *,
    k: int = 10,
    method: str = "sum",
    norm: str = "minmax",
) -> DataFrame:
    """CombSUM / CombMNZ / CombANZ fusion (Fox & Shaw, TREC-2 1994)
    over scored lists, each with columns (id, score): normalize each
    list independently (`normalize_scores`), then
      sum: fused = sum of normalized scores
      mnz: fused = sum * (number of lists containing the id)
      anz: fused = sum / (number of lists containing the id)
    Returns top-k (id, fused_score, n_lists, rank), tie-break
    (fused_score desc, id asc); fused scores rounded to 9dp before
    ranking so accumulation order can never reorder ties across
    engines (same contract as rrf_fuse). Same scale shape as RRF: the
    fusion touches only depth x n_lists rows, never the corpus."""
    if not lists:
        raise ValueError("comb_fuse needs at least one scored list")
    if method not in ("sum", "mnz", "anz"):
        raise ValueError(f"unknown comb method {method!r}")
    u = normalize_scores(lists[0], norm)
    for df in lists[1:]:
        u = u.unionByName(normalize_scores(df, norm))
    agg = u.groupBy("id").agg(
        F.sum("nscore").alias("ssum"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    fused = {
        "sum": F.col("ssum"),
        "mnz": F.col("ssum") * F.col("n_lists"),
        "anz": F.col("ssum") / F.col("n_lists"),
    }[method]
    scored = agg.select(
        "id", F.round(fused, 9).alias("fused_score"), "n_lists"
    )
    top = scored.orderBy(F.desc("fused_score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("fused_score"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id", "fused_score", "n_lists", "rank"
    )


def hybrid_bm25_cosine_combsum(
    index,
    embeddings: DataFrame,
    terms: list[str],
    qvec: list[float],
    *,
    k: int = 10,
    depth: int = 50,
    method: str = "sum",
    norm: str = "minmax",
) -> DataFrame:
    """Score-fusion sibling of hybrid_bm25_cosine_topk: CombSUM/MNZ/ANZ
    over the 6dp-rounded BM25 top-`depth` and cosine top-`depth` lists
    (shared id space doc_id == vec_id). Returns
    (id, fused_score, n_lists, rank)."""
    from terrier_ef_spark.pipeline.similarity import cosine_topk
    from terrier_ef_spark.query.engine import run_queries

    lex_deep = run_queries(
        index,
        [{"qid": 1, "terms": terms, "mode": "disjunctive"}],
        k=2 * depth,
        strategy="term_major",
    )
    # same stable-membership margin as the RRF path, but the fusion
    # consumes the 6dp score itself, not just the rank
    w = Window.orderBy(F.desc(F.round(F.col("score"), 6)), F.asc("docid"))
    lex = (
        lex_deep.withColumn("r6", F.row_number().over(w))
        .where(F.col("r6") <= depth)
        .select(F.col("docid").alias("id"),
                F.round(F.col("score"), 6).alias("score"))
    )
    sem = cosine_topk(embeddings, qvec, k=depth).select(
        F.col("vec_id").alias("id"), F.col("cos").alias("score")
    )
    return comb_fuse([lex, sem], k=k, method=method, norm=norm)


def _ranked_6dp(scored: DataFrame, score_col: str, id_col: str, depth: int) -> DataFrame:
    """Deterministic (id, rank) from a scored frame: rank on
    (round(score, 6) desc, id asc), keep the top `depth`. The 6dp
    rounding is the same stable-rerank contract the BM25/ANN oracle
    twins use, so fusion ranks are engine-independent."""
    w = Window.orderBy(F.desc(F.round(F.col(score_col), 6)), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= depth)
        .select(F.col(id_col).alias("id"), "rank")
    )


def hybrid_bm25_cosine_topk(
    index,
    embeddings: DataFrame,
    terms: list[str],
    qvec: list[float],
    *,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = DEFAULT_K_RRF,
) -> DataFrame:
    """Hybrid top-k: RRF-fuse a disjunctive BM25 top-`depth` over the
    EF index with a cosine top-`depth` over `embeddings`, joined on
    the shared id space (doc_id == vec_id). Returns
    (id, rrf_score, rank).

    The lexical list runs on the term-major scorer (the broadcast-free
    10^9-doc path); the semantic list is the exact cosine scan (swap in
    ivf_topk / batch_cosine_topk for the approximate scale path — RRF
    only consumes (id, rank), so the lists are pluggable)."""
    from terrier_ef_spark.pipeline.similarity import cosine_topk
    from terrier_ef_spark.query.engine import run_queries

    # fetch 2x depth at full precision, then 6dp-rank down to `depth`:
    # the margin makes the 6dp top-`depth` membership independent of
    # full-precision cutoff noise at the boundary (same pattern as the
    # contract's stable-rerank BM25 twin)
    lex_deep = run_queries(
        index,
        [{"qid": 1, "terms": terms, "mode": "disjunctive"}],
        k=2 * depth,
        strategy="term_major",
    )
    lex = _ranked_6dp(lex_deep, "score", "docid", depth)
    sem = cosine_topk(embeddings, qvec, k=depth).select(
        F.col("vec_id").alias("id"), "rank"
    )
    return rrf_fuse([lex, sem], k=k, k_rrf=k_rrf)
