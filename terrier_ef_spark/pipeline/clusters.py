"""Duplicate-cluster resolution and benchmark decontamination.

LSH candidate pairs + Jaccard verification (pipeline/dedup.py) give
near-duplicate EDGES; a real 100 TB dedup must resolve them into
CONNECTED COMPONENTS and keep one canonical doc per component (pairs
alone under-delete: a~b and b~c must collapse to one survivor even if
a~c was never a candidate pair).

Connected components here is the alternating large-star / small-star
algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
is two groupBy-join passes over the edge set, converging in
O(log^2 n) rounds regardless of component diameter — unlike naive
min-label propagation, whose round count is the graph diameter (a
pathological chain of boilerplate docs at 100 TB can be millions
long). Every round localCheckpoints the edge set: iterative Spark
plans otherwise grow lineage linearly and re-execute the whole
history each round.

Decontamination: benchmark n-gram sets are tiny (MBs) next to the
corpus, so the right 100 TB shape is a BROADCAST semi-join of corpus
n-grams against the benchmark n-gram set — corpus rows never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.pipeline.dedup import (
    MAX_BUCKET,
    N_BANDS,
    _SIG_SQL,
    _TOK_SQL,
    ngram_jaccard_pairs,
)
from terrier_ef_spark.tokenizer import tokenize_expr

# convergence backstop: log2(10^12)^2 / 4 ~ 400; real corpora converge
# in < 10 rounds (Kiveris et al. §5 measure 5-7 on multi-billion-edge
# graphs). Hitting the cap raises instead of silently mislabeling.
MAX_CC_ROUNDS = 50

DECON_N = 5  # decontamination n-gram length (tokens)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: for every node u, connect every strictly
    larger neighbor to min(N(u) ∪ {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges to the smaller endpoint; for every
    node u, connect u and its smaller neighbors to its min neighbor."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbr = o.join(mins, "u").select(F.col("v").alias("a"), "m")
    self_ = mins.select(F.col("u").alias("a"), "m")
    return (
        nbr.unionByName(self_)
        .where(F.col("a") != F.col("m"))
        .select(F.col("a").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, *, max_rounds: int = MAX_CC_ROUNDS) -> DataFrame:
    """(node, comp) for every node in `edges` (two long columns, any
    names; treated undirected), comp = min node id of its component.

    Alternating large-star/small-star with per-round lineage
    truncation; convergence is detected by edge-set fixpoint (two
    anti-join counts — cheap next to the round itself)."""
    a, b = edges.columns[:2]
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        prev = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        changed = (
            e.exceptAll(prev).limit(1).count()
            + prev.exceptAll(e).limit(1).count()
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # fixpoint of small-star is a star forest u -> root; roots map to
    # themselves
    return e.select(F.col("u").alias("node"), F.col("v").alias("comp")).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("comp"))
    ).distinct()


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    n_bands: int = N_BANDS,
    max_bucket: int | None = MAX_BUCKET,
    *,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Resolve verified near-duplicate pairs into components:
    (doc_id, cluster_id, keep) for every doc in a cluster of size >= 2,
    cluster_id = min doc_id of the cluster, keep = canonical survivor.
    Docs in no cluster are implicitly kept (not emitted).

    `edges` takes a pre-materialized verified-pair relation
    (doc_a, doc_b) — the production shape at scale: pair derivation
    (MinHash -> LSH -> Jaccard verify) is the expensive pass and its
    output is tiny, so it is computed ONCE, written to a table, and
    every downstream consumer (CC here, audits, incremental re-dedup)
    reads the materialization instead of re-deriving it. Without
    `edges` the pairs are derived inline (small-corpus convenience)."""
    if edges is None:
        edges = ngram_jaccard_pairs(docs, threshold, n_bands, max_bucket)
    edges = edges.select("doc_a", "doc_b")
    cc = connected_components(edges)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("keep"),
    )


# oracle twin: transitive closure by recursive CTE (min reachable id ==
# component min), over the identical verified-pair edge set
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SIG_SQL},
ver AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN s sa ON sa.doc_id = cand.doc_a
  JOIN s sb ON sb.doc_id = cand.doc_b
  WHERE round(len(list_intersect(sa.sh, sb.sh))::double
              / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.5
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM ver
  UNION
  SELECT doc_b, doc_a FROM ver
),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(node, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON edges.u = reach.r
)
SELECT node AS doc_id, min(r) AS cluster_id, node = min(r) AS keep
FROM reach GROUP BY node
"""


def _ngrams(col, n: int):
    toks = tokenize_expr(col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _ngrams_sql(n: int) -> str:
    return f"""
CASE WHEN len(toks) >= {n}
     THEN list_distinct(list_transform(range(len(toks) - {n - 1}),
                        i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' ')))
     ELSE [] END
"""


def contamination_hits(
    docs: DataFrame, bench: DataFrame, n: int = DECON_N
) -> DataFrame:
    """(doc_id, n_hits): corpus docs sharing >= 1 token n-gram with any
    benchmark doc, n_hits = number of distinct shared n-grams. Corpus
    docs also present in `bench` (same doc_id) are not reported.

    Scale shape: the benchmark n-gram set is broadcast (benchmarks are
    MBs; the corpus is TBs), so this is a map-side semi-join — corpus
    n-grams are generated and probed in place, never shuffled. The only
    shuffle is the final per-doc count."""
    bench_ids = bench.select("doc_id").distinct()
    bg = bench.select(
        F.explode(_ngrams(F.col("text"), n)).alias("g")
    ).distinct()
    dg = docs.join(bench_ids, "doc_id", "left_anti").select(
        "doc_id", F.explode(_ngrams(F.col("text"), n)).alias("g")
    )
    return (
        dg.join(F.broadcast(bg), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def contamination_sql(bench_pred: str, n: int = DECON_N) -> str:
    """Oracle twin; `bench_pred` is a SQL predicate over documents
    selecting the benchmark rows (e.g. 'doc_id % 97 = 0')."""
    return f"""
WITH t AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_ngrams_sql(n)}) AS g FROM t),
bg AS (SELECT DISTINCT g.g FROM g JOIN documents d USING (doc_id) WHERE {bench_pred}),
dg AS (SELECT g.doc_id, g.g FROM g JOIN documents d USING (doc_id) WHERE NOT ({bench_pred}))
SELECT doc_id, count(*) AS n_hits FROM dg JOIN bg USING (g) GROUP BY 1
"""
