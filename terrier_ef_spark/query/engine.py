"""Query execution over the EF index — the Spark restructuring of the
retrieval lifecycle (SURVEY.md §3 E2). Two strategies:

term_major (default for exhaustive scoring; the batch-engine shape):
    query terms --(pushed parquet filter)--> matched term-block rows
    --mapInPandas decode (each blob decoded EXACTLY ONCE per batch)-->
    (term, docid, tf) --join doclen (partitioned join on docid; AQE
    picks broadcast only when the docs side is genuinely small)-->
    contribution rows (pure Catalyst BM25 arithmetic, JVM-side)
    --broadcast qterms fanout--> groupBy(qid, docid) partial-agg sum
    --> per-qid window top-k.
    No dense doclen broadcast, no per-query blob replication: a head
    term shared by 256 batch queries ships ONE decoded copy, and the
    qid fanout moves only (qid, docid, contrib) rows. This is the
    10^9-doc-safe path (the r01 scale-killers were the driver-side
    doclen array and blob-per-qid shuffle).

query_major (the reference's DAAT shape; one of two BMW homes):
    matched blobs --repartition by qid--> per-query applyInPandas
    kernel (decode + BM25/BMW top-k in NumPy). Doc lengths ride a
    Spark broadcast (the reference loads them fully in RAM too,
    EFDocumentIndex.java:43-47) — viable to ~1e8 docs; beyond that use
    term_major.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import block_upper_bound, decode_bound
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.bm25 import TermPostings

RESULT_SCHEMA = "qid long, rank int, docid long, score double"


def _query_plan(queries: list[dict], k: int):
    """Flatten the query batch: per-query (mode, k), distinct
    (qid, term, weight) rows, and distinct-term counts. Query-term
    weights (Terrier's `term^w` operator) default to 1.0 and come from
    an optional q['weights'] mapping; they scale the term's
    contribution linearly, so every pruning bound stays valid for
    w > 0 (negative weights are rejected — they would invert bounds)."""
    qmeta = {
        int(q["qid"]): (q.get("mode", "disjunctive"), int(q.get("k", k)))
        for q in queries
    }
    qterm_rows = []
    for q in queries:
        weights = q.get("weights") or {}
        for t in dict.fromkeys(q["terms"]):
            w = float(weights.get(t, 1.0))
            if w <= 0:
                raise ValueError(f"query term weight must be > 0, got {w} for {t!r}")
            qterm_rows.append((int(q["qid"]), t, w))
    n_query_terms = {qid: 0 for qid in qmeta}
    for qid, _, _ in qterm_rows:
        n_query_terms[qid] += 1
    return qmeta, qterm_rows, n_query_terms


# Dirichlet smoothing parameter (Zhai & Lafferty, SIGIR'01 default)
LM_MU = 2500.0
HIEMSTRA_C = 0.15
# PL2 term-frequency normalization-2 parameter (Amati & van Rijsbergen)
PL2_C = 1.0
LOG2_E = 1.4426950408889634


def run_queries(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    algo: str = "naive",
    strategy: str = "auto",
    model: str = "bm25",
    doc_filter: DataFrame | None = None,
    respect_deletes: bool = True,
    k1: float | None = None,
    b: float | None = None,
    prior: DataFrame | None = None,
    prior_weight: float = 1.0,
    boost_pairs: DataFrame | None = None,
    boost_unmatched: bool = False,
) -> DataFrame:
    """queries: [{'qid': int, 'terms': [str], 'mode':
    'disjunctive'|'conjunctive'[, 'not_terms': [str]]}]. not_terms are
    boolean MUST_NOT: any doc containing one is excluded from that
    query's results (term-major naive only, like doc_filter).

    Returns (qid, rank, docid, score), rank 1-based, tie-break
    (score desc, docid asc). strategy: 'term_major' | 'query_major' |
    'auto'. auto picks query_major for SMALL batches on SMALL
    collections (the per-query kernel has near-zero plan overhead;
    term-major pays a fixed 2-3 Spark stages), and term_major for
    large batches — where decode-once-per-term dominates — or whenever
    the collection is too big for the kernel's doclen broadcast
    (>1e8 docs). algo='bmw' runs on BOTH strategies: the query-major
    DAAT kernel (reference shape) or the fully relational BMW
    (_run_queries_term_major_bmw — no doclen broadcast, the 10^9-doc
    pruned path); both are rank-identical to exhaustive.
    algo='maxscore' (Turtle & Flood 1995, the other safe pruning
    algorithm terrier-micro ships) runs in the query-major kernel; on
    the term-major strategy it routes to the relational BMW — both are
    safe-to-k, so results are identical either way.

    model: 'bm25' (both strategies) | 'dph' | 'pl2' | 'inl2' |
    'dlh13' | 'tf_idf' | 'ifb2' | 'in_expb2' | 'bb2' | 'lgd' |
    'dfree' | 'lm_dirichlet' | 'lm_jm' (term-major only —
    published formulas: DFR DPH, PL2, InL2 and DLH13 after Amati,
    the Bernoulli-aftereffect DFR family IFB2 / In_expB2 / BB2 after
    Amati & van Rijsbergen TOIS'02, the log-logistic LGD after
    Clinchant & Gaussier SIGIR'10, parameter-free DFRee after Amati,
    Robertson-tf x Sparck-Jones-idf TF_IDF as Terrier parameterizes
    it, Dirichlet-smoothed LM after Zhai & Lafferty, Jelinek-Mercer
    LM after Hiemstra; like Terrier's pluggable weighting models).

    k1/b: BM25 parameters. Default to the values recorded at build
    time in stats.json (build_index(k1=, b=)), else the module
    constants (1.2/0.75); explicit args override per call. Threaded
    through every kernel including the BMW/MaxScore pruning bounds,
    so pruning stays safe-to-k at any setting.

    doc_filter: optional (docid) DataFrame restricting results to a
    candidate set (metadata-filtered search, e.g. lang='en' docs).
    Collection statistics (df/cf/avgdl) stay corpus-global — standard
    filtered-retrieval semantics. The filter is a left-semi join on the
    decoded posting rows (term-major exhaustive path only: any size of
    filter relation, sort-merge at scale; BMW/MaxScore bounds and the
    query-major kernel seed their thresholds pre-filter, so they refuse
    rather than silently over-prune).

    prior: optional (docid, prior) DataFrame of static query-
    independent document priors (pagerank, recency, URL-depth — the
    web priors of Kraaij, Westerveld & Hiemstra SIGIR'02; Terrier's
    document-prior feature). Scores become
    score + prior_weight * ln(prior) ON THE FULL MATCHED SET (the
    prior joins the folded (qid, docid) scores BEFORE ranking, so a
    strong prior can promote a doc into the top-k from any rank —
    not a post-hoc re-rank of a fixed page). Priors must be > 0;
    docs absent from the relation take the neutral prior 1
    (ln 1 = 0). Same term-major-only discipline as doc_filter: BMW/
    MaxScore term bounds and the query-major kernel's thresholds
    know nothing of the additive prior, so pruning could discard
    docs the prior would promote — they refuse instead.

    boost_pairs: optional (qid, docid, boost) DataFrame of additive
    per-(query, document) score boosts, joined onto the FOLDED
    (qid, docid) scores before ranking (docs absent from the relation
    take boost 0; duplicate rows fold to max, the prior discipline).
    This is the Zoekt symbol-rank channel (query/symbols.py builds
    the relation: a query term that names a symbol DEFINITION in a
    doc outranks an incidental body match) but is generic — any
    query-dependent additive evidence. With the default
    boost_unmatched=False, exactness requires every boosted doc to be
    in the matched set (symbol defs are, by construction: the
    defining doc contains the term); a boost row whose (qid, docid)
    matched no query term is dropped by the join. boost_unmatched=True
    makes the join FULL OUTER: a boost-only doc ENTERS the candidate
    set at score = boost with zero content hits (Zoekt's filename-only
    match, query/pathrank.py) — disjunctive only in effect, since the
    conjunctive nhit == n_terms filter still drops it. Either way a
    pruning bound cannot account for the addend — boost_pairs is
    term-major exhaustive only, like prior.

    respect_deletes: when the index carries tombstones
    (index/maintenance.py delete_docs), exclude them from results via a
    left-anti join on the decoded posting rows. Same term-major-only
    constraint as doc_filter, and for the same reason: a pruning seed
    theta computed over deleted docs can exceed the live k-th score and
    over-prune — wrong results, not just slow ones. Tombstoned indexes
    therefore refuse algo='bmw'/'maxscore' (compact first); collection
    statistics stay global until compaction (Lucene semantics)."""
    if model not in ("bm25", "dph", "pl2", "inl2", "dlh13", "tf_idf",
                 "ifb2", "in_expb2", "bb2", "lgd", "dfree",
                 "lm_dirichlet", "lm_jm"):
        raise ValueError(f"unknown weighting model {model!r}")
    if algo not in ("naive", "bmw", "maxscore"):
        raise ValueError(f"unknown algo {algo!r}")
    if doc_filter is not None:
        if algo != "naive":
            raise ValueError(
                "doc_filter runs on the exhaustive term-major scorer; "
                f"algo={algo!r} seeds pruning thresholds pre-filter"
            )
        if strategy == "query_major":
            raise ValueError(
                "doc_filter is relational (term-major only); the "
                "query-major kernel does not support candidate filters"
            )
        strategy = "term_major"
    if prior is not None:
        if algo != "naive":
            raise ValueError(
                "prior runs on the exhaustive term-major scorer; "
                f"algo={algo!r} bounds don't include the additive prior"
            )
        if strategy == "query_major":
            raise ValueError(
                "prior is relational (term-major only); the "
                "query-major kernel does not support document priors"
            )
        strategy = "term_major"
    if boost_pairs is not None:
        if algo != "naive":
            raise ValueError(
                "boost_pairs runs on the exhaustive term-major scorer; "
                f"algo={algo!r} bounds don't include the additive boost"
            )
        if strategy == "query_major":
            raise ValueError(
                "boost_pairs is relational (term-major only); the "
                "query-major kernel does not support per-pair boosts"
            )
        strategy = "term_major"
    if any(q.get("not_terms") for q in queries):
        # boolean MUST_NOT: docs containing any excluded term are
        # anti-joined out before ranking — same term-major-only
        # discipline as doc_filter (a pruning theta seeded over docs
        # that exclusion will remove could exceed the true k-th score)
        if algo != "naive":
            raise ValueError(
                "not_terms run on the exhaustive term-major scorer; "
                f"algo={algo!r} seeds pruning thresholds pre-exclusion"
            )
        if strategy == "query_major":
            raise ValueError(
                "not_terms are relational (term-major only); the "
                "query-major kernel does not support exclusions"
            )
        strategy = "term_major"
    if model != "bm25":
        if algo in ("bmw", "maxscore"):
            raise ValueError("pruning-metadata bounds are BM25-specific")
        if strategy == "query_major":
            raise ValueError(
                "the query-major DAAT kernel scores BM25 only; "
                f"model={model!r} runs on strategy='term_major'"
            )
        strategy = "term_major"
    # tombstone checks come AFTER the pure-argument validation above:
    # they are the only checks that touch the index artifacts
    tombstones = index.deleted_docids() if respect_deletes else None
    if tombstones is not None:
        if algo != "naive":
            raise ValueError(
                "index has tombstoned deletes: pruning algorithms seed "
                "their threshold over docs that can no longer be returned "
                "(unsafe over-pruning) — compact_index first, or "
                f"algo='naive' (got algo={algo!r})"
            )
        if strategy == "query_major":
            raise ValueError(
                "index has tombstoned deletes: the query-major kernel "
                "does not support exclusion filters — strategy='term_major'"
            )
        strategy = "term_major"
    if strategy == "auto":
        if len(queries) >= 64 or index.stats["num_docs"] > 100_000_000:
            strategy = "term_major"
        else:
            strategy = "query_major"
    # BM25 parameters: explicit args win, else the values recorded at
    # build time in stats.json, else the module defaults — so a
    # k1/b-tuned build scores consistently with zero caller changes
    if k1 is None:
        k1 = float(index.stats.get("k1", bm25.K1))
    if b is None:
        b = float(index.stats.get("b", bm25.B))
    if strategy == "term_major":
        if algo in ("bmw", "maxscore"):
            # both are safe-to-k; the relational pruned path is BMW
            return _run_queries_term_major_bmw(index, queries, k=k,
                                               k1=k1, b=b)
        return _run_queries_term_major(
            index, queries, k=k, model=model, doc_filter=doc_filter,
            exclude_docs=tombstones, k1=k1, b=b,
            prior=prior, prior_weight=prior_weight,
            boost_pairs=boost_pairs, boost_unmatched=boost_unmatched,
        )
    return _run_queries_query_major(index, queries, k=k, algo=algo,
                                    k1=k1, b=b)


def run_queries_page(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    after: dict[int, tuple[float, int]] | None = None,
    model: str = "bm25",
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """Stateless deep pagination — the Elasticsearch `search_after`
    role. Pages are ordered by (round(score, 6) desc, docid asc) — the
    engine's cross-engine-stable contract ordering — and a page's
    cursor is simply its last row's (score, docid). `after` maps qid ->
    that cursor; queries without an entry get their FIRST page.

    Unlike offset pagination, the cursor filters the folded scores
    BEFORE the rank window: every partition discards at-or-before-
    cursor rows pre-sort, so page 10^6 costs the same as page 1 — no
    offset-sized ranking state accumulates anywhere (the reason
    search_after exists in distributed serving). Returns
    (qid, rank, docid, score) with rank 1..k WITHIN the page and
    scores 6dp-rounded.

    Term-major exhaustive only (the same discipline as doc_filter:
    pruning bounds seeded on absolute top-k scores would over-prune a
    deep page whose scores are all below theta)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    for qid, cur in (after or {}).items():
        if len(cur) != 2:
            raise ValueError(
                f"after[{qid}] must be a (score, docid) cursor: {cur!r}"
            )
    if k1 is None:
        k1 = float(index.stats.get("k1", bm25.K1))
    if b is None:
        b = float(index.stats.get("b", bm25.B))
    after_df = None
    if after:
        after_df = index.spark.createDataFrame(
            [
                (int(qid), round(float(s), 6), int(d))
                for qid, (s, d) in after.items()
            ],
            "qid long, a_score double, a_docid long",
        )
    return _run_queries_term_major(
        index, queries, k=k, model=model,
        exclude_docs=index.deleted_docids(),
        k1=k1, b=b, after_df=after_df, stable6=True,
    )


def _bm25_contrib_expr(num_docs: float, avgdl: float, tf, dl,
                       k1: float = bm25.K1, b: float = bm25.B):
    """Catalyst BM25 contribution (Robertson idf x tf-normalization) for
    a posting row joined to (global_df, doclen) — shared by the
    exhaustive term-major scorer and the relational BMW path."""
    idf = F.log2(
        (F.lit(num_docs) - F.col("global_df") + 0.5) / (F.col("global_df") + 0.5)
    )
    tfn = (tf * (k1 + 1)) / (
        k1 * (1 - b + b * dl / F.lit(avgdl)) + tf
    )
    return idf * tfn


def _run_queries_term_major(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int,
    model: str = "bm25",
    doc_filter: DataFrame | None = None,
    exclude_docs: DataFrame | None = None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    prior: DataFrame | None = None,
    prior_weight: float = 1.0,
    after_df: DataFrame | None = None,
    stable6: bool = False,
    boost_pairs: DataFrame | None = None,
    boost_unmatched: bool = False,
) -> DataFrame:
    """Relational batch scorer: decode once per term-block, Catalyst
    scoring arithmetic, qid fanout of (docid, contrib) rows only."""
    spark = index.spark
    qmeta, qterm_rows, n_query_terms = _query_plan(queries, k)
    if not qterm_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    distinct_terms = sorted({t for _, t, _ in qterm_rows})
    posts = _decode_for_batch(index, queries, qmeta, distinct_terms)
    if doc_filter is not None:
        # candidate restriction BEFORE scoring (top-k is computed over
        # the filtered set); left-semi keeps the posting-row schema,
        # tolerates duplicate filter rows without a distinct shuffle,
        # and lets Catalyst pick broadcast vs sort-merge by filter size
        posts = posts.join(doc_filter.select("docid"), "docid", "left_semi")
    if exclude_docs is not None:
        # tombstone exclusion: left-anti mirrors the doc_filter semi —
        # duplicate-tolerant, schema-preserving, broadcast vs sort-merge
        # left to Catalyst by tombstone-set size
        posts = posts.join(exclude_docs.select("docid"), "docid", "left_anti")
    # boolean MUST_NOT terms: per-qid (qid, docid) exclusion pairs from
    # the excluded terms' posting lists (pushed isin scan), anti-joined
    # after the per-(qid, docid) fold inside _score_rows
    not_rows = [
        (int(q["qid"]), t)
        for q in queries
        for t in dict.fromkeys(q.get("not_terms", ()))
    ]
    exclude_pairs = None
    if not_rows:
        nq = spark.createDataFrame(not_rows, "qid long, term string")
        nterms = sorted({t for _, t in not_rows})
        exclude_pairs = (
            decode_postings(index, nterms)
            .join(F.broadcast(nq), "term")
            .select("qid", "docid")
        )
    if boost_pairs is not None and boost_unmatched:
        # boost-only docs ENTER the candidate set downstream, so the
        # posts-level doc_filter / tombstone restrictions must also
        # bind the boost relation — otherwise a filename-only match
        # could bypass the metadata filter or resurrect a deleted doc
        if doc_filter is not None:
            boost_pairs = boost_pairs.join(
                doc_filter.select("docid"), "docid", "left_semi"
            )
        if exclude_docs is not None:
            boost_pairs = boost_pairs.join(
                exclude_docs.select("docid"), "docid", "left_anti"
            )
    return _score_rows(index, posts, qterm_rows, qmeta, n_query_terms, model,
                       exclude_pairs=exclude_pairs, k1=k1, b=b,
                       prior=prior, prior_weight=prior_weight,
                       after_df=after_df, stable6=stable6,
                       boost_pairs=boost_pairs,
                       boost_unmatched=boost_unmatched)


def _score_rows(
    index: EFIndex,
    posts: DataFrame,
    qterm_rows: list[tuple],
    qmeta: dict,
    n_query_terms: dict,
    model: str = "bm25",
    exclude_pairs: DataFrame | None = None,
    k1: float = bm25.K1,
    b: float = bm25.B,
    prior: DataFrame | None = None,
    prior_weight: float = 1.0,
    after_df: DataFrame | None = None,
    stable6: bool = False,
    boost_pairs: DataFrame | None = None,
    boost_unmatched: bool = False,
) -> DataFrame:
    """Scoring tail of the term-major strategy: (term, docid, tf) rows
    -> lexicon + partitioned doclen joins -> Catalyst model contribution
    -> broadcast qterms fanout -> per-(qid, docid) sum -> per-qid
    top-k. Shared by the exhaustive scorer and the relational BMW path
    (which feeds a pruned superset of the rows that matter)."""
    spark = index.spark
    stats = index.stats
    num_docs = float(stats["num_docs"])
    avgdl = float(stats["avgdl"])
    num_tokens = float(stats.get("num_tokens") or (num_docs * avgdl))

    qterms_df = spark.createDataFrame(
        qterm_rows, "qid long, term string, w double"
    )
    qmeta_df = spark.createDataFrame(
        [
            (qid, mode, kq, n_query_terms[qid])
            for qid, (mode, kq) in qmeta.items()
        ],
        "qid long, mode string, kq int, n_terms int",
    )
    distinct_terms = sorted({t for _, t, _ in qterm_rows})
    lex = index.lexicon.select(
        "term",
        F.col("df").cast("double").alias("global_df"),
        F.col("cf").cast("double").alias("global_cf"),
    ).where(F.col("term").isin(distinct_terms))
    posts = posts.join(F.broadcast(lex), "term")
    # partitioned doclen join — never a driver-side dense array; Catalyst
    # may still elect a broadcast-hash join when the docs table is small
    # (a relational decision that reverses itself at scale, unlike an
    # unconditional collect+broadcast)
    posts = posts.join(index.docs.select("docid", "doclen"), "docid")

    contrib = model_contrib_expr(
        model, num_docs=num_docs, avgdl=avgdl, num_tokens=num_tokens,
        k1=k1, b=b,
    )
    posts = posts.select("term", "docid", contrib.alias("contrib"))

    scored = (
        posts.join(F.broadcast(qterms_df), "term")
        .groupBy("qid", "docid")
        .agg(
            F.sum(F.col("contrib") * F.col("w")).alias("score"),
            F.count(F.lit(1)).alias("nhit"),
        )
    )
    if boost_pairs is not None:
        # query-dependent additive boost on the FOLDED scores, before
        # ranking (the prior discipline, keyed (qid, docid)): matched
        # docs absent from the relation take boost 0; duplicate rows
        # fold to max. With boost_unmatched=False boost rows outside
        # the matched set drop at the join (callers guarantee boosted
        # docs match — symbol defs do); with True the join is FULL
        # OUTER and a boost-only doc ENTERS the candidate set at
        # score = boost, nhit = 0 (Zoekt's filename-only match: a doc
        # whose path matches ranks even with zero content hits —
        # conjunctive queries still drop it at the nhit == n_terms
        # filter). Joined BEFORE tombstone/NOT exclusion and the
        # prior, so entering docs honor both.
        bp = boost_pairs.groupBy("qid", "docid").agg(
            F.max(F.col("boost").cast("double")).alias("_boost")
        )
        how = "full_outer" if boost_unmatched else "left"
        scored = (
            scored.join(bp, ["qid", "docid"], how)
            .withColumn(
                "score",
                F.coalesce(F.col("score"), F.lit(0.0))
                + F.coalesce(F.col("_boost"), F.lit(0.0)),
            )
            .withColumn("nhit", F.coalesce(F.col("nhit"), F.lit(0)))
            .drop("_boost")
        )
    if exclude_pairs is not None:
        scored = scored.join(exclude_pairs, ["qid", "docid"], "left_anti")
    if prior is not None:
        # static query-independent prior on the FOLDED scores, before
        # ranking (one docid-keyed join of the matched set against the
        # prior relation; missing docs take the neutral prior 1).
        # Duplicate docid rows fold to max() — duplicate-tolerant like
        # the doc_filter semi join, deterministic under conflicts; a
        # non-positive prior fails the job (raise_error INSIDE the
        # score expression, so column pruning can't eliminate the
        # check) rather than silently nulling the score through ln(<=0)
        p = prior.groupBy("docid").agg(
            F.max(F.col("prior").cast("double")).alias("_prior")
        )
        lnp = (
            F.when(F.col("_prior").isNull(), F.lit(0.0))
            .when(F.col("_prior") > 0, F.log(F.col("_prior")))
            .otherwise(
                F.raise_error(
                    F.lit("document priors must be > 0 (ln-prior boost)")
                )
            )
        )
        scored = (
            scored.join(p, "docid", "left")
            .withColumn(
                "score",
                F.col("score") + F.lit(float(prior_weight)) * lnp,
            )
            .drop("_prior")
        )
    res = scored.join(F.broadcast(qmeta_df), "qid").where(
        (F.col("mode") == "disjunctive") | (F.col("nhit") == F.col("n_terms"))
    )
    if stable6:
        # page-stable ordering: rank on the 6dp-rounded score (the
        # contract convention) so cursors compare identically on every
        # engine and across reruns
        res = res.withColumn("score", F.round("score", 6))
    if after_df is not None:
        # search_after cursor: drop everything at-or-before the cursor
        # in (score desc, docid asc) order BEFORE the rank window —
        # each partition discards non-page rows pre-sort, so deep pages
        # never accumulate offset-sized state anywhere
        res = (
            res.join(F.broadcast(after_df), "qid", "left")
            .where(
                F.col("a_score").isNull()
                | (F.col("score") < F.col("a_score"))
                | (
                    (F.col("score") == F.col("a_score"))
                    & (F.col("docid") > F.col("a_docid"))
                )
            )
            .drop("a_score", "a_docid")
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("kq"))
        .select("qid", "rank", "docid", "score")
    )


def model_contrib_expr(
    model: str,
    *,
    num_docs: float,
    avgdl: float,
    num_tokens: float,
    k1: float = bm25.K1,
    b: float = bm25.B,
):
    """The per-posting Catalyst contribution expression for a weighting
    model, over a relation carrying columns tf, doclen, global_df,
    global_cf. Shared by _score_rows (single-model retrieval) and
    query/features.py (multi-feature extraction computes several of
    these as sibling columns in ONE pass)."""
    tf = F.col("tf").cast("double")
    dl = F.col("doclen").cast("double")
    if model == "bm25":
        contrib = _bm25_contrib_expr(num_docs, avgdl, tf, dl, k1, b)
    elif model == "dph":
        # DFR DPH (Amati; parameter-free): f = tf/dl,
        # norm = (1-f)^2/(tf+1),
        # contrib = norm * (tf*log2(tf*(avgdl/dl)*(N/cf))
        #                   + 0.5*log2(2*pi*tf*(1-f)))
        # f == 1 (term fills the doc) => norm = 0 and the log2(1-f) term
        # is undefined; the contribution is 0 by the norm factor.
        f_ = tf / dl
        norm = (1 - f_) * (1 - f_) / (tf + 1)
        body = tf * F.log2(
            tf * (F.lit(avgdl) / dl) * (F.lit(num_docs) / F.col("global_cf"))
        ) + 0.5 * F.log2(2 * float(np.pi) * tf * (1 - f_))
        contrib = F.when(tf < dl, norm * body).otherwise(F.lit(0.0))
    elif model == "pl2":
        # DFR PL2 (Poisson estimation, Laplace aftereffect,
        # normalization 2 — Amati & van Rijsbergen TOIS'02):
        # tfn = tf*log2(1 + c*avgdl/dl), lam = cf/N,
        # contrib = (tfn*log2(1/lam) + lam*log2e
        #            + 0.5*log2(2*pi*tfn) + tfn*(log2(tfn) - log2e))
        #           / (tfn + 1)
        tfn_ = tf * F.log2(1 + F.lit(PL2_C * avgdl) / dl)
        lam = F.col("global_cf") / F.lit(num_docs)
        contrib = (
            tfn_ * F.log2(1 / lam)
            + lam * F.lit(LOG2_E)
            + 0.5 * F.log2(2 * float(np.pi) * tfn_)
            + tfn_ * (F.log2(tfn_) - F.lit(LOG2_E))
        ) / (tfn_ + 1)
    elif model == "inl2":
        # DFR InL2 (inverse document frequency model, Laplace
        # aftereffect, normalization 2 — Amati & van Rijsbergen
        # TOIS'02; Terrier's InL2, c = 1):
        # tfn = tf*log2(1 + c*avgdl/dl),
        # contrib = tfn/(tfn+1) * log2((N+1)/(df+0.5))
        tfn_ = tf * F.log2(1 + F.lit(PL2_C * avgdl) / dl)
        contrib = (
            tfn_ / (tfn_ + 1)
            * F.log2(F.lit(num_docs + 1) / (F.col("global_df") + 0.5))
        )
    elif model == "dlh13":
        # DFR DLH13 (parameter-free hypergeometric model, Laplace
        # normalization — Amati 2006; Terrier's DLH13): f = tf/dl,
        # contrib = (tf*log2(tf*(avgdl/dl)*(N/cf))
        #            + 0.5*log2(2*pi*tf*(1-f))) / (tf + 0.5)
        # f == 1 makes log2(1-f) undefined; contribution is 0 then
        # (the same guard the DPH branch documents).
        f_ = tf / dl
        body = tf * F.log2(
            tf * (F.lit(avgdl) / dl) * (F.lit(num_docs) / F.col("global_cf"))
        ) + 0.5 * F.log2(2 * float(np.pi) * tf * (1 - f_))
        contrib = F.when(tf < dl, body / (tf + 0.5)).otherwise(F.lit(0.0))
    elif model in ("ifb2", "in_expb2", "bb2"):
        # DFR Bernoulli-aftereffect family, normalization 2 (Amati &
        # van Rijsbergen TOIS'02; Terrier's IFB2 / In_expB2 / BB2,
        # c = 1): tfn = tf*log2(1 + c*avgdl/dl), F = collection term
        # frequency (cf), n = document frequency (df),
        # Bernoulli norm = (F+1)/(n*(tfn+1)), contrib = norm * Inf1.
        #   IFB2:     Inf1 = tfn * log2((N+1)/(F+0.5))
        #   In_expB2: Inf1 = tfn * log2((N+1)/(n_exp+0.5)),
        #             n_exp = N*(1 - ((N-1)/N)^F)
        #   BB2:      Inf1 = -log2(N-1) - log2(e)
        #                    + stirling(N+F-1, N+F-tfn-2)
        #                    - stirling(F, F-tfn),
        #             stirling(a, b) = (b+0.5)*log2(a/b) + (a-b)*log2(a)
        # BB2's Stirling body requires F > tfn (a term whose normalized
        # in-doc frequency exceeds its collection frequency leaves the
        # Bose-Einstein approximation's domain, as in Terrier); such
        # rows contribute 0.
        tfn_ = tf * F.log2(1 + F.lit(PL2_C * avgdl) / dl)
        cf_ = F.col("global_cf")
        bnorm = (cf_ + 1) / (F.col("global_df") * (tfn_ + 1))
        if model == "ifb2":
            contrib = bnorm * tfn_ * F.log2(F.lit(num_docs + 1) / (cf_ + 0.5))
        elif model == "in_expb2":
            n_exp = F.lit(num_docs) * (
                1 - F.pow(F.lit((num_docs - 1) / num_docs), cf_)
            )
            contrib = bnorm * tfn_ * F.log2(
                F.lit(num_docs + 1) / (n_exp + 0.5)
            )
        else:  # bb2

            def _stirling(a, b_):
                return (b_ + 0.5) * F.log2(a / b_) + (a - b_) * F.log2(a)

            body = (
                F.lit(-np.log2(num_docs - 1) - LOG2_E)
                + _stirling(F.lit(num_docs) + cf_ - 1,
                            F.lit(num_docs) + cf_ - tfn_ - 2)
                - _stirling(cf_, cf_ - tfn_)
            )
            contrib = F.when(cf_ > tfn_, bnorm * body).otherwise(F.lit(0.0))
    elif model == "lgd":
        # Log-logistic information-based model (Clinchant & Gaussier
        # SIGIR'10; Terrier's LGD, c = 1): tfn = tf*log2(1+c*avgdl/dl),
        # lambda = df/N, contrib = log2((lambda + tfn)/lambda)
        tfn_ = tf * F.log2(1 + F.lit(PL2_C * avgdl) / dl)
        lam = F.col("global_df") / F.lit(num_docs)
        contrib = F.log2((lam + tfn_) / lam)
    elif model == "dfree":
        # DFRee (Amati; parameter-free DFR from the entire collection):
        # prior = tf/dl, posterior = (tf+1)/(dl+1), invC = C/cf,
        # norm = tf*log2(posterior/prior),
        # contrib = norm * (tf*(-log2(prior*invC))
        #                   + (tf+1)*log2(posterior*invC)
        #                   + 0.5*log2(posterior/prior))
        prior = tf / dl
        post = (tf + 1) / (dl + 1)
        invc = F.lit(num_tokens) / F.col("global_cf")
        norm = tf * F.log2(post / prior)
        contrib = norm * (
            tf * (-F.log2(prior * invc))
            + (tf + 1) * F.log2(post * invc)
            + 0.5 * F.log2(post / prior)
        )
    elif model == "tf_idf":
        # Robertson tf x Sparck-Jones idf as Terrier's TF_IDF
        # parameterizes it (k1 = 1.2, b = 0.75, log base 2):
        # Rtf = k1*tf / (tf + k1*(1 - b + b*dl/avgdl)),
        # idf = log2(1 + N/df), contrib = Rtf * idf
        rtf = (
            F.lit(bm25.K1) * tf
            / (tf + F.lit(bm25.K1) * (1 - bm25.B + F.lit(bm25.B) * dl / F.lit(avgdl)))
        )
        contrib = rtf * F.log2(1 + F.lit(num_docs) / F.col("global_df"))
    elif model == "lm_dirichlet":
        # Dirichlet-smoothed query likelihood (Zhai & Lafferty SIGIR'01)
        # in the per-matched-term decomposition (as in Lucene's
        # LMDirichletSimilarity): log2(1 + tf/(mu*p_c)) + log2(mu/(dl+mu)),
        # p_c = cf / num_tokens.
        p_c = F.col("global_cf") / F.lit(num_tokens)
        contrib = F.log2(1 + tf / (F.lit(LM_MU) * p_c)) + F.log2(
            F.lit(LM_MU) / (dl + F.lit(LM_MU))
        )
    elif model == "lm_jm":
        # Jelinek-Mercer-smoothed query likelihood in Hiemstra's form
        # (Hiemstra 2000; Terrier's Hiemstra_LM, c = 0.15):
        # log2(1 + (c * tf * num_tokens) / ((1-c) * cf * dl)) per
        # matched term — unmatched terms contribute 0, so disjunctive
        # accumulation is exact.
        contrib = F.log2(
            1 + (F.lit(HIEMSTRA_C) * tf * F.lit(num_tokens))
            / (F.lit(1 - HIEMSTRA_C) * F.col("global_cf") * dl)
        )
    else:
        raise ValueError(f"unknown weighting model {model!r}")
    return contrib


# per-term selective-decode cutover, MEASURED kernel break-even
# (BASELINE.md round-2 addendum): with the batched multi-run kernel
# (decode_*_quanta_multi — one field gather + one unpackbits pass for
# ALL runs) selective decode beats whole-list vectorized decode until
# the decoded quanta reach ~1/4 of the list's quanta. Scattered
# candidates decode ~1 quantum each, so term t qualifies when
# candidates < (df_t >> log2q) / FACTOR — verified end-to-end: a
# rare-and-hot conjunctive batch at df ratio 51:1 (log2q=3) runs 1.67x
# faster selective, and rank-identity holds either way.
TERM_MAJOR_SELECTIVE_QUANTA_FACTOR = 4
# query-major kernel's per-query switch to mask/pointer selective
# decode; re-measured round 3 on the 256-query mixed BMW batch at
# sf0.1 with an INTERLEAVED A/B (contention drift on this VM swamps
# sequential sweeps): 2048 beat 512 in all six paired reps (~4%,
# best 62.1 vs 59.5 q/s), both clearly beat never-selective
# (39 q/s) and 8192 (31 q/s). See BASELINE.md round-3 addendum.
QUERY_MAJOR_SELECTIVE_MIN_QUANTA = 2048


def _decode_for_batch(
    index: EFIndex, queries: list[dict], qmeta: dict, distinct_terms: list[str]
) -> DataFrame:
    """Decode stage of the term-major scorer with CONJUNCTIVE skip
    semantics: every disjunctive-query term and every conjunctive
    rarest term is decoded in full (once per batch), but a long list
    that appears only as a NON-rarest conjunctive term is decoded
    selectively — only the quanta holding the rarest term's docids are
    unpacked (decode_postings_selective), the distributed analogue of
    the reference's skipTo intersection. A conjunctive query with a
    term absent from the lexicon can never be satisfied, so it triggers
    no decode at all.

    Correctness: a conjunctive result doc must contain the rarest term,
    so candidate-routed rows cover every surviving doc; disjunctive
    scoring still sees full lists. Rank-identity is asserted in
    test_queries.py (selective forced on)."""
    if all(qmeta[int(q["qid"])][0] != "conjunctive" for q in queries):
        return decode_postings(index, terms=distinct_terms)
    df_rows = (
        index.lexicon.select("term", "df")
        .where(F.col("term").isin(distinct_terms))
        .collect()
    )
    df_by_term = {r["term"]: int(r["df"]) for r in df_rows}

    full_terms: set[str] = set()
    rarest_by_qid: dict[int, str] = {}
    conj_terms: set[str] = set()
    sel_qterm_rows: list[tuple[int, str]] = []
    for q in queries:
        qid = int(q["qid"])
        mode = qmeta[qid][0]
        terms_q = list(dict.fromkeys(q["terms"]))
        if mode != "conjunctive":
            full_terms.update(t for t in terms_q if t in df_by_term)
            continue
        if any(t not in df_by_term for t in terms_q):
            continue  # unsatisfiable conjunction: decode nothing for it
        rarest = min(terms_q, key=lambda t: (df_by_term[t], t))
        rarest_by_qid[qid] = rarest
        full_terms.add(rarest)
        conj_terms.update(terms_q)
        sel_qterm_rows.extend((qid, t) for t in terms_q if t != rarest)

    # per-term cost rule: candidates for term t are bounded by the sum
    # of its queries' rarest-term dfs; each scattered candidate decodes
    # ~1 quantum, so selective pays only while candidate quanta stay
    # under 1/FACTOR of the term's quanta (measured break-even above)
    log2q = int(index.stats["log2_quantum"])
    cand_bound: dict[str, int] = {}
    for qid, t in sel_qterm_rows:
        cand_bound[t] = cand_bound.get(t, 0) + df_by_term[rarest_by_qid[qid]]
    sel_terms = sorted(
        t
        for t in (conj_terms - full_terms)
        if cand_bound[t] * TERM_MAJOR_SELECTIVE_QUANTA_FACTOR
        < (df_by_term[t] >> log2q)
    )
    if not sel_terms:
        return decode_postings(index, terms=distinct_terms)
    full_terms.update((conj_terms - full_terms) - set(sel_terms))

    spark = index.spark
    posts_full = decode_postings(index, terms=sorted(full_terms))
    # candidates: rarest-term postings routed to their qids (the rarest
    # lists are short by construction — re-decoding them here is cheaper
    # than caching the batch's full decode)
    rarest_df = spark.createDataFrame(
        [(qid, t) for qid, t in rarest_by_qid.items()], "qid long, term string"
    )
    cand_q = (
        decode_postings(index, terms=sorted(set(rarest_by_qid.values())))
        .join(F.broadcast(rarest_df), "term")
        .select("qid", "docid")
    )
    sel_qterms = spark.createDataFrame(
        [(qid, t) for qid, t in sel_qterm_rows if t in sel_terms],
        "qid long, term string",
    )
    cand_td = (
        cand_q.join(F.broadcast(sel_qterms), "qid")
        .select("term", "docid")
        .distinct()
    )
    posts_sel = decode_postings_selective(index, cand_td, terms=sel_terms)
    return posts_full.unionByName(posts_sel)


# relational BMW pays ~6 fixed extra Spark stages (metadata pass, seed
# decode, exact-theta scoring, survivor filter) — roughly 10s of
# orchestration at local scale regardless of data volume. Re-measured
# round 3 WITH quantum-aligned bounds on a maximally prunable corpus
# (84% of quanta pruned, single 3-term query, interleaved best-of-3):
# exhaustive still wins 2.3-3.0x at 0.3M / 0.9M / 3.1M matched
# postings — at local[32] the per-survivor relational machinery
# (metadata explode, bounds kernel Arrow traffic, quantum-routed
# decode joins) costs more than the ~19ns/posting whole-blob kernel
# decode it avoids (BASELINE.md round-3 addendum 3). The gate
# therefore STAYS at 10M: below it the exhaustive scorer is simply
# faster; above it — and on >1e8-doc collections where the query-major
# kernel's doclen broadcast is gated off — the pruned path bounds
# decode volume when whole-list decode becomes the dominant cost.
BMW_TERM_MAJOR_MIN_POSTINGS = 10_000_000


def _run_queries_term_major_bmw(
    index: EFIndex, queries: list[dict], *, k: int,
    k1: float = bm25.K1, b: float = bm25.B,
) -> DataFrame:
    """Distributed block-max WAND on the term-major strategy — the
    pruned-top-k path with NO dense doclen broadcast and NO per-query
    kernel, i.e. BMW that still works at 10^9+ docs (the query-major
    DAAT kernel is reference parity, bounded by its doclen broadcast).

    Conjunctive queries route to the exact selective term-major scorer
    (their skip is candidate-driven, not theta-driven); disjunctive
    queries run the relational BMW below."""
    qmeta, _, _ = _query_plan(queries, k)
    conj = [q for q in queries if qmeta[int(q["qid"])][0] == "conjunctive"]
    disj = [q for q in queries if qmeta[int(q["qid"])][0] != "conjunctive"]
    parts = []
    if conj:
        parts.append(_run_queries_term_major(index, conj, k=k, k1=k1, b=b))
    if disj:
        parts.append(_bmw_disjunctive_relational(index, disj, k=k,
                                                 k1=k1, b=b))
    if not parts:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _bmw_disjunctive_relational(
    index: EFIndex, queries: list[dict], *, k: int,
    k1: float = bm25.K1, b: float = bm25.B,
) -> DataFrame:
    """Safe-to-k relational BMW (Ding & Suel SIGIR'11, re-expressed as
    DataFrame stages):

    1. quantum-metadata relation: posexplode the stored per-quantum
       (last docid, max tf, min dl) grids of the MATCHED terms only ->
       per-quantum upper bound ub = max(idf, 0 for negative idf) x
       tfn(max_tf, min_dl). Negative-idf terms get ub = 0 everywhere,
       so all their quanta always survive — partial sums therefore
       never overstate a score (the safe-to-k argument needs computed
       <= true for sub-theta docs).
    2. seed: per qid, the kq+1 highest-ub quanta; decode them
       (decode_postings_by_quanta keeps qpos so rows route back to the
       qids that picked them), then score the seed docs EXACTLY via
       candidate-selective decode across all the query's terms. theta =
       the qid's k-th best exact seed score.
    3. survive: quantum (t, j) survives for qid iff
       w_t*ub_t(j) + sum_{t'!=t} w_t'*U_t' >= theta. Any doc with true
       score >= theta has ALL its quanta survive, so the union decode
       is complete for every potential top-k doc; sub-theta docs may
       score partially but (contributions complete-or-missing, never
       overstated) cannot displace them.
    4. decode the union of surviving quanta ONCE per (term, quantum)
       across the batch and run the shared relational scoring tail.

    Falls back to the exhaustive term-major scorer when the matched
    lists are too short for pruning to pay."""
    spark = index.spark
    stats = index.stats
    num_docs = float(stats["num_docs"])
    avgdl = float(stats["avgdl"])

    qmeta, qterm_rows, n_query_terms = _query_plan(queries, k)
    if not qterm_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    distinct_terms = sorted({t for _, t, _ in qterm_rows})
    df_by_term = {
        r["term"]: int(r["df"])
        for r in index.lexicon.select("term", "df")
        .where(F.col("term").isin(distinct_terms))
        .collect()
    }
    present = sorted(df_by_term)
    if sum(df_by_term.values()) < BMW_TERM_MAJOR_MIN_POSTINGS:
        return _run_queries_term_major(index, queries, k=k, k1=k1, b=b)

    # ---- stage 1: per-quantum upper bounds (metadata only) ----
    # each quantum also carries its docid interval (q_lo_excl, q_hi]:
    # hi = the stored q_last_docid, lo = the previous quantum's last
    # docid (the blob's first_docid - 1 for the first quantum). The
    # true interval is a subset — postings start later — so using it
    # for cross-term overlap only LOOSENS bounds (never unsafe).
    src = index.postings.select(
        "term", "block_id", "first_docid", "q_last_docid", "q_max_tf", "q_min_dl"
    ).where(F.col("term").isin(present))
    z = F.posexplode(F.arrays_zip("q_last_docid", "q_max_tf", "q_min_dl"))
    meta = src.select(
        "term", "block_id", "first_docid", "q_last_docid", z.alias("qpos", "z")
    ).select(
        "term",
        "block_id",
        "qpos",
        F.col("z.q_max_tf").cast("double").alias("qtf"),
        F.col("z.q_min_dl").cast("double").alias("qdl"),
        F.col("z.q_last_docid").alias("q_hi"),
        F.when(F.col("qpos") == 0, F.col("first_docid") - 1)
        .otherwise(F.element_at("q_last_docid", F.col("qpos")))
        .alias("q_lo_excl"),
    )
    idf_df = spark.createDataFrame(
        [(t, bm25.idf(num_docs, df_by_term[t])) for t in present],
        "term string, idf double",
    )
    tfn_ub = (F.col("qtf") * (k1 + 1)) / (
        k1 * (1 - b + b * F.col("qdl") / F.lit(avgdl)) + F.col("qtf")
    )
    meta = (
        meta.join(F.broadcast(idf_df), "term")
        .withColumn(
            "ub",
            F.when(F.col("idf") > 0, F.col("idf") * tfn_ub).otherwise(F.lit(0.0)),
        )
        .select("term", "block_id", "qpos", "ub", "q_lo_excl", "q_hi")
        .persist()
    )
    present_qterms = [(qid, t, w) for qid, t, w in qterm_rows if t in df_by_term]
    if not present_qterms:
        meta.unpersist()
        return spark.createDataFrame([], RESULT_SCHEMA)
    pq_df = spark.createDataFrame(present_qterms, "qid long, term string, w double")
    fan = meta.join(F.broadcast(pq_df), "term")

    # ---- stage 2: seed + exact theta ----
    # seed the top kq+1 quanta per query (not kq/2^q): the k best docs
    # can sit in k DISTINCT quanta, and theta is only as good as the
    # k-th best seed doc — under-seeding yields a filler-doc theta that
    # prunes nothing (measured on the heterogeneous-tf fixture)
    seedn_df = spark.createDataFrame(
        [(qid, kq + 1, kq) for qid, (_, kq) in qmeta.items()],
        "qid long, sn int, kq int",
    )
    wnd = Window.partitionBy("qid").orderBy(
        F.desc(F.col("w") * F.col("ub")), "term", "block_id", "qpos"
    )
    seed_picks = (
        fan.withColumn("rn", F.row_number().over(wnd))
        .join(F.broadcast(seedn_df), "qid")
        .where(F.col("rn") <= F.col("sn"))
        .select("qid", "term", "block_id", "qpos")
        .localCheckpoint(eager=True)  # tiny (kq+1 rows/qid); consumed twice
    )
    picks_arr = (
        seed_picks.select("term", "block_id", "qpos")
        .distinct()
        .groupBy("term", "block_id")
        .agg(F.sort_array(F.collect_set("qpos")).alias("qidx"))
    )
    seed_rows = decode_postings_by_quanta(index, picks_arr)
    seed_docs = (
        seed_rows.join(
            seed_picks.distinct(), ["term", "block_id", "qpos"]
        )
        .select("qid", "docid")
        .distinct()
        .localCheckpoint(eager=True)  # tiny; cuts the seed-decode lineage
    )
    cand_td = (
        seed_docs.join(F.broadcast(pq_df.select("qid", "term")), "qid")
        .select("term", "docid")
        .distinct()
    )
    cand_rows = decode_postings_selective(index, cand_td, terms=present)
    lexb = index.lexicon.select(
        "term", F.col("df").cast("double").alias("global_df")
    ).where(F.col("term").isin(present))
    tf = F.col("tf").cast("double")
    dl = F.col("doclen").cast("double")
    contribs = (
        cand_rows.join(F.broadcast(lexb), "term")
        .join(index.docs.select("docid", "doclen"), "docid")
        .select(
            "term", "docid",
            _bm25_contrib_expr(num_docs, avgdl, tf, dl, k1, b).alias("contrib"),
        )
        .join(F.broadcast(pq_df), "term")
        .join(seed_docs, ["qid", "docid"])  # exact scores for seeds only
        .groupBy("qid", "docid")
        .agg(F.sum(F.col("contrib") * F.col("w")).alias("score"))
    )
    thw = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    theta = (
        contribs.withColumn("rn", F.row_number().over(thw))
        .join(F.broadcast(seedn_df.select("qid", "kq")), "qid")
        .where(F.col("rn") == F.col("kq"))
        .select("qid", F.col("score").alias("theta"))
        .localCheckpoint(eager=True)  # tiny (one row per qid at most)
    )

    # ---- stage 3: survivors under QUANTUM-ALIGNED (docid-overlap) bounds ----
    # block-aligned cross-term bounds (r02) pruned ~0% on multi-term
    # queries: within any co-occupied block each term's block max
    # dominates theta everywhere. The quantum grid is finer. For a doc d
    # in quantum j of term t (docids in (lo_j, hi_j]), term t''s
    # contribution is bounded by ub_{t'} of the t'-quantum CONTAINING d,
    # hence by the max ub over t' quanta whose docid interval overlaps
    # (lo_j, hi_j] — and by 0 where t' has no postings at all (the
    # reference's per-quantum skip grid, DocidReader.java:118-183, gives
    # exactly this docid alignment for free). Quantum (t, j) survives
    # for qid iff  w_t*ub_t(j) + sum_{t'!=t} w'*overlapmax_{t'} >= theta;
    # any doc with true score >= theta therefore has ALL its quanta
    # survive (each addend bounds its contribution), so the union decode
    # stays complete for every potential top-k doc.
    #
    # Computed per (qid, block) METADATA group in one vectorized kernel:
    # overlapping quanta form a contiguous run of the other term's
    # sorted grid (searchsorted on the interval ends), and the run
    # maxima all come from one np.maximum.reduceat pass. An interval
    # max-join has no efficient Catalyst shape — the equi-join + range
    # filter degenerates to per-group cross products on hot terms —
    # while the kernel is O((n+m) log) per term pair and sees only
    # metadata rows (the blocking keeps groups bounded: quanta of one
    # query's terms within one docid-range block).
    bound_schema = "qid long, term string, block_id long, qpos long, bound double"

    def qbounds(key, pdf):
        by_term = {}
        for t, g in pdf.groupby("term", sort=True):
            g = g.sort_values("qpos")
            by_term[t] = (
                g["q_hi"].to_numpy(np.int64),
                g["q_lo_excl"].to_numpy(np.int64),
                g["ub"].to_numpy(np.float64) * float(g["w"].iloc[0]),
                g["qpos"].to_numpy(np.int64),
            )
        out = []
        for t, (hi, lo, wub, qpos) in by_term.items():
            other = np.zeros(len(hi))
            for t2, (hi2, _lo2, wub2, _q2) in by_term.items():
                if t2 != t:
                    other += _overlap_range_max(hi2, wub2, lo, hi)
            out.append(
                pd.DataFrame(
                    {
                        "qid": np.full(len(hi), int(key[0]), dtype=np.int64),
                        "term": t,
                        "block_id": np.full(len(hi), int(key[1]), dtype=np.int64),
                        "qpos": qpos,
                        "bound": wub + other,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    bounds = fan.groupBy("qid", "block_id").applyInPandas(qbounds, bound_schema)
    surv_picks = (
        bounds.join(theta, "qid", "left")
        .where(
            # 1e-9 slack: ub-side idf is np.log2 while theta came through
            # Catalyst F.log2 — a 1-ulp mismatch must loosen the bound
            # (decode a few extra quanta), never prune a theta-tight one
            F.col("theta").isNull()
            | (F.col("bound") >= F.col("theta") - F.lit(1e-9))
        )
        .select("term", "block_id", "qpos")
        .distinct()
        .groupBy("term", "block_id")
        .agg(F.sort_array(F.collect_set("qpos")).alias("qidx"))
        .localCheckpoint(eager=True)  # metadata-sized; lets meta release
    )
    meta.unpersist()
    rows = decode_postings_by_quanta(index, surv_picks).select("term", "docid", "tf")
    return _score_rows(index, rows, qterm_rows, qmeta, n_query_terms, "bm25",
                       k1=k1, b=b)


def _overlap_range_max(
    q_hi: np.ndarray, vals: np.ndarray, lo_excl: np.ndarray, hi: np.ndarray
) -> np.ndarray:
    """For each query interval i = (lo_excl[i], hi[i]], the max of
    `vals` over the quanta of another term whose docid interval
    (q_hi[j-1], q_hi[j]] overlaps it; 0.0 where nothing overlaps.

    Quantum j overlaps iff q_hi[j] > lo_excl[i] (ends after the
    interval opens) and q_hi[j-1] < hi[i] (starts before it closes;
    always true for j = 0) — a CONTIGUOUS run [start, end) of the
    ascending grid, so all the run maxima come from one
    np.maximum.reduceat pass over interleaved (start, end) boundaries
    (odd slots are garbage between runs and are discarded)."""
    n = len(q_hi)
    out = np.zeros(len(lo_excl))
    if n == 0:
        return out
    start = np.searchsorted(q_hi, lo_excl, side="right")
    end = np.minimum(np.searchsorted(q_hi, hi, side="left") + 1, n)
    ok = start < end
    if not ok.any():
        return out
    padded = np.append(vals, 0.0)  # allows end == n as a boundary index
    idx = np.stack([start[ok], end[ok]], axis=1).ravel()
    out[ok] = np.maximum.reduceat(padded, idx)[::2]
    return out


def decode_term_selective(
    grp: pd.DataFrame,
    candidates: np.ndarray,
    num_docs: int,
    block_bits: int | None,
    log2q: int,
    stats: dict | None = None,
):
    """Decode ONLY the quanta of a term's posting blocks that can
    contain `candidates` (sorted absolute docids) — the engine-level
    skipTo (reference: EFBasicIterablePosting.next(target) walks skip
    pointers to the containing quantum, DocidReader.java:118-183; here
    the stored q_last_docid grid routes straight to the quanta and ALL
    selected quanta decode in one batched kernel pass).

    Returns (docids_abs, tfs) covering every candidate present in the
    term's list (supersets are fine — membership is re-checked by the
    caller). `stats` accumulates {'decoded', 'total'} quantum counts."""
    d_parts, f_parts = [], []
    for r in grp.itertuples(index=False):
        q_last = np.asarray(r.q_last_docid, dtype=np.int64)  # absolute
        if stats is not None:
            stats["total"] = stats.get("total", 0) + len(q_last)
        base = 0 if block_bits is None else int(r.block_id) << block_bits
        ub = block_upper_bound(block_bits, num_docs)
        cand = candidates[
            (candidates >= int(r.first_docid)) & (candidates <= int(r.last_docid))
        ]
        if len(cand) == 0:
            continue
        qidx = np.unique(np.searchsorted(q_last, cand, side="left"))
        qidx = qidx[qidx < len(q_last)]
        if stats is not None:
            stats["decoded"] = stats.get("decoded", 0) + len(qidx)
        q_last_rel = q_last - base
        d_parts.append(
            ef.decode_docids_quanta_multi(
                bytes(r.docids_ef), int(r.df), ub, q_last_rel, qidx, log2q
            ) + base
        )
        f_parts.append(
            ef.decode_freqs_quanta_multi(
                bytes(r.freqs_ef), int(r.df), int(r.cf), qidx, log2q
            )
        )
    if not d_parts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(d_parts), np.concatenate(f_parts)


def _conjunctive_selective(
    term_groups: list,
    doclen_arr: np.ndarray,
    avgdl: float,
    kq: int,
    num_docs: int,
    block_bits: int | None,
    log2q: int,
    stats: dict | None = None,
    k1: float = bm25.K1,
    b: float = bm25.B,
):
    """Conjunctive top-k with block-selective decode: the rarest term's
    list is decoded fully (it defines the candidates); every other term
    decodes only candidate quanta. term_groups: [(global_df, idf, grp)]."""
    term_groups = sorted(term_groups, key=lambda t: t[0])
    _, idf0, grp0 = term_groups[0]
    if stats is not None:
        nq0 = sum(len(r.q_last_docid) for r in grp0.itertuples(index=False))
        stats["total"] = stats.get("total", 0) + nq0
        stats["decoded"] = stats.get("decoded", 0) + nq0
    cand, f0 = _decode_term_full(grp0, num_docs, block_bits, log2q)
    if len(cand) == 0:
        return cand, np.zeros(0)
    decoded = [(idf0, cand, f0)]

    for _, idf_t, grp in term_groups[1:]:
        if len(cand) == 0:
            return cand[:0], np.zeros(0)
        d_t, f_t = decode_term_selective(
            grp, cand, num_docs, block_bits, log2q, stats
        )
        if len(d_t) == 0:
            return cand[:0], np.zeros(0)
        pos = np.minimum(np.searchsorted(d_t, cand), len(d_t) - 1)
        cand = cand[d_t[pos] == cand]
        decoded.append((idf_t, d_t, f_t))

    if len(cand) == 0:
        return cand, np.zeros(0)
    scores = np.zeros(len(cand))
    for idf_t, d_t, f_t in decoded:
        pos = np.searchsorted(d_t, cand)  # every survivor is present
        scores += idf_t * bm25.tfn(
            f_t[pos], doclen_arr[cand].astype(np.float64), avgdl, k1, b
        )
    return bm25._topk(cand, scores, kq)


def _decode_term_full(grp: pd.DataFrame, num_docs: int, block_bits: int | None, log2q: int):
    d_parts, f_parts = [], []
    for r in grp.itertuples(index=False):
        base = 0 if block_bits is None else int(r.block_id) << block_bits
        ub = block_upper_bound(block_bits, num_docs)
        d_parts.append(
            ef.decode_docids(bytes(r.docids_ef), int(r.df), ub, log2q) + base
        )
        f_parts.append(
            ef.decode_freqs(bytes(r.freqs_ef), int(r.df), int(r.cf), log2q)
        )
    if not d_parts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(d_parts), np.concatenate(f_parts)


def _decode_term_quanta_mask(
    grp: pd.DataFrame,
    keep_mask_per_row: list,
    num_docs: int,
    block_bits: int | None,
    log2q: int,
    stats: dict | None = None,
):
    """Decode only the quanta flagged in keep_mask_per_row (one bool
    array per block row, aligned with that row's q_last grid)."""
    d_parts, f_parts = [], []
    for r, mask in zip(grp.itertuples(index=False), keep_mask_per_row):
        if stats is not None:
            stats["total"] = stats.get("total", 0) + len(mask)
            stats["decoded"] = stats.get("decoded", 0) + int(mask.sum())
        if not mask.any():
            continue
        base = 0 if block_bits is None else int(r.block_id) << block_bits
        ub = block_upper_bound(block_bits, num_docs)
        q_last_rel = np.asarray(r.q_last_docid, dtype=np.int64) - base
        qidx = np.flatnonzero(mask)
        d_parts.append(
            ef.decode_docids_quanta_multi(
                bytes(r.docids_ef), int(r.df), ub, q_last_rel, qidx, log2q
            ) + base
        )
        f_parts.append(
            ef.decode_freqs_quanta_multi(
                bytes(r.freqs_ef), int(r.df), int(r.cf), qidx, log2q
            )
        )
    if not d_parts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(d_parts), np.concatenate(f_parts)


def _exact_scores_from(
    live: list, arrays: dict, cand: np.ndarray,
    doclen_arr: np.ndarray, avgdl: float,
    k1: float = bm25.K1, b: float = bm25.B,
) -> np.ndarray:
    """Exact BM25 scores for `cand` given each term's decoded
    (docids, tfs) in `arrays` (which must cover every candidate's
    postings) — shared by the selective BMW and MaxScore kernels."""
    s = np.zeros(len(cand))
    for i, (_, idf_t, _) in enumerate(live):
        d_t, f_t = arrays[i]
        if len(d_t) == 0:
            continue
        pos = np.minimum(np.searchsorted(d_t, cand), len(d_t) - 1)
        hit = d_t[pos] == cand
        c = idf_t * bm25.tfn(
            f_t[pos], doclen_arr[d_t[pos]].astype(np.float64), avgdl, k1, b
        )
        s += np.where(hit, c, 0.0)
    return s


def _metadata_bounds(
    live: list, avgdl: float, k1: float = bm25.K1, b: float = bm25.B
) -> list:
    """Per-term per-quantum upper bounds from metadata only (no
    decode): [(idf, [per-row (q_last_abs, ub_arr)], U_t)]."""
    metas = []
    for gdf, idf_t, grp in live:
        rows_meta = []
        u_t = 0.0
        for r in grp.itertuples(index=False):
            q_last = np.asarray(r.q_last_docid, dtype=np.int64)
            max_tfn = bm25.tfn(
                np.asarray(r.q_max_tf, dtype=np.float64),
                np.asarray(r.q_min_dl, dtype=np.float64),
                avgdl, k1, b,
            )
            ub = idf_t * max_tfn
            if idf_t < 0:
                ub = np.maximum(ub, 0.0)
            rows_meta.append((q_last, ub))
            if len(ub):
                u_t = max(u_t, float(ub.max()))
        metas.append((idf_t, rows_meta, u_t))
    return metas


def _seed_theta(
    live: list, metas: list, kq: int, num_docs: int,
    block_bits: int | None, log2q: int,
    doclen_arr: np.ndarray, avgdl: float,
    k1: float = bm25.K1, b: float = bm25.B,
):
    """Provisional threshold from a metadata-guided seed: pick the
    highest-UPPER-BOUND quanta of the highest-idf terms until they
    hold >= kq docs, decode ONLY those quanta, exact-score the seed
    docs selectively. Returns (theta, seed_union) — theta is a valid
    lower bound of the true k-th score (seed scores are exact)."""
    order = np.argsort([-idf_t for _, idf_t, _ in live])
    seed_docs: list[np.ndarray] = []
    chosen = 0
    for i in order:
        i = int(i)
        _, rows_meta, _ = metas[i]
        grp = live[i][2]
        q = 1 << log2q
        masks = [np.zeros(len(ub), dtype=bool) for _, ub in rows_meta]
        flat = []
        for ri, (r, (_, ub)) in enumerate(zip(grp.itertuples(index=False), rows_meta)):
            df_b = int(r.df)
            for j in range(len(ub)):
                flat.append((float(ub[j]), ri, j, min(q, df_b - j * q)))
        flat.sort(key=lambda t: -t[0])
        for _, ri, j, cnt in flat:
            if chosen >= kq:
                break
            masks[ri][j] = True
            chosen += cnt
        d_i, _ = _decode_term_quanta_mask(grp, masks, num_docs, block_bits, log2q)
        seed_docs.append(d_i)
        if chosen >= kq:
            break
    seed_union = (
        np.unique(np.concatenate(seed_docs)) if seed_docs else np.zeros(0, np.int64)
    )
    seed_arrays = {
        i: decode_term_selective(grp, seed_union, num_docs, block_bits, log2q)
        for i, (_, _, grp) in enumerate(live)
    }
    seed_scores = _exact_scores_from(live, seed_arrays, seed_union, doclen_arr, avgdl, k1, b)
    theta = (
        np.partition(seed_scores, -kq)[-kq] if len(seed_scores) >= kq else -np.inf
    )
    return theta, seed_union


def _bmw_selective(
    term_groups: list,
    doclen_arr: np.ndarray,
    avgdl: float,
    kq: int,
    num_docs: int,
    block_bits: int | None,
    log2q: int,
    stats: dict | None = None,
    k1: float = bm25.K1,
    b: float = bm25.B,
):
    """Block-max WAND with DECODE pruning (VERDICT r01 wrong #6): the
    per-quantum (max tf, min dl) metadata bounds each quantum's best
    contribution WITHOUT decoding it; a quantum whose bound plus every
    other term's global best is below the provisional threshold theta
    is never decoded (its bytes are never unpacked). Safe-to-k:

      score(d) <= ub_t(quantum of d in t) + sum_{t'!=t} U_t'   for any t,
      so a pruned quantum only holds docs provably below theta, and any
      doc with true score >= theta has ALL its quanta decoded — the
      exact top-k is unchanged (rank-identical to exhaustive).

    term_groups: [(global_df, idf, grp)] — grp rows sorted by block_id."""
    live = [(gdf, idf_t, grp) for gdf, idf_t, grp in term_groups if len(grp)]
    if not live:
        return np.zeros(0, dtype=np.int64), np.zeros(0)

    metas = _metadata_bounds(live, avgdl, k1, b)
    sum_u = sum(u for _, _, u in metas)
    theta, _ = _seed_theta(
        live, metas, kq, num_docs, block_bits, log2q, doclen_arr, avgdl,
        k1, b,
    )

    # quantum survival: ub_t(j) + sum_{t'!=t} U_t' >= theta
    full_arrays: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for i, (idf_t, rows_meta, u_t) in enumerate(metas):
        other = sum_u - u_t
        if np.isfinite(theta):
            masks = [ub + other >= theta for _, ub in rows_meta]
        else:
            masks = [np.ones(len(ub), dtype=bool) for _, ub in rows_meta]
        full_arrays[i] = _decode_term_quanta_mask(
            live[i][2], masks, num_docs, block_bits, log2q, stats
        )

    # per-doc bound over decoded postings, then exact re-score
    if all(len(full_arrays[i][0]) == 0 for i in range(len(live))):
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    all_d, all_ub = [], []
    for i, (idf_t, rows_meta, _) in enumerate(metas):
        d_t = full_arrays[i][0]
        if len(d_t) == 0:
            continue
        q_last_cat = np.concatenate([ql for ql, _ in rows_meta])
        ub_cat = np.concatenate([ub for _, ub in rows_meta])
        blk = np.minimum(
            np.searchsorted(q_last_cat, d_t, side="left"), len(ub_cat) - 1
        )
        all_d.append(d_t)
        all_ub.append(ub_cat[blk])
    uniq, inv = np.unique(np.concatenate(all_d), return_inverse=True)
    doc_ub = np.bincount(inv, weights=np.concatenate(all_ub))
    survivors = uniq[doc_ub >= theta] if np.isfinite(theta) else uniq
    scores = _exact_scores_from(live, full_arrays, survivors, doclen_arr, avgdl, k1, b)
    return bm25._topk(survivors, scores, kq)


def _maxscore_selective(
    term_groups: list,
    doclen_arr: np.ndarray,
    avgdl: float,
    kq: int,
    num_docs: int,
    block_bits: int | None,
    log2q: int,
    stats: dict | None = None,
    k1: float = bm25.K1,
    b: float = bm25.B,
):
    """MaxScore with DECODE pruning: essential lists (term-level upper
    bound can still reach theta) decode fully; non-essential lists
    decode ONLY candidate quanta — the vectorized form of MaxScore's
    skipTo probes (Turtle & Flood 1995), on the same quantum-selective
    kernel as the BMW and conjunctive paths. Safe-to-k: a doc absent
    from every essential list scores <= the non-essential UB prefix
    sum < theta <= the true k-th score, so it can never enter the
    top-k; every candidate is exact-scored across ALL lists.

    term_groups: [(global_df, idf, grp)] — grp rows sorted by block_id."""
    live = [(gdf, idf_t, grp) for gdf, idf_t, grp in term_groups if len(grp)]
    if not live:
        return np.zeros(0, dtype=np.int64), np.zeros(0)

    metas = _metadata_bounds(live, avgdl, k1, b)
    theta, seed_union = _seed_theta(
        live, metas, kq, num_docs, block_bits, log2q, doclen_arr, avgdl,
        k1, b,
    )

    # maximal ascending-UB prefix with cumulative UB strictly below
    # theta is non-essential (UBs clamped >= 0: a doc outside a
    # negative-idf list gains 0 from it, same bound discipline as the
    # whole-list kernel bm25.topk_maxscore)
    u = [max(u_t, 0.0) for _, _, u_t in metas]
    order = np.argsort(u, kind="stable")
    cum = 0.0
    essential = set(range(len(live)))
    for i in order:
        if np.isfinite(theta) and cum + u[int(i)] < theta:
            cum += u[int(i)]
            essential.discard(int(i))
        else:
            break

    arrays: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    cand_parts = [seed_union]
    for i in sorted(essential):
        grp = live[i][2]
        if stats is not None:
            nq = sum(len(r.q_last_docid) for r in grp.itertuples(index=False))
            stats["total"] = stats.get("total", 0) + nq
            stats["decoded"] = stats.get("decoded", 0) + nq
        arrays[i] = _decode_term_full(grp, num_docs, block_bits, log2q)
        cand_parts.append(arrays[i][0])
    cand = np.unique(np.concatenate(cand_parts))
    for i in range(len(live)):
        if i not in arrays:
            arrays[i] = decode_term_selective(
                live[i][2], cand, num_docs, block_bits, log2q, stats
            )
    scores = _exact_scores_from(live, arrays, cand, doclen_arr, avgdl, k1, b)
    return bm25._topk(cand, scores, kq)


def _run_queries_query_major(
    index: EFIndex, queries: list[dict], *, k: int, algo: str,
    k1: float = bm25.K1, b: float = bm25.B,
) -> DataFrame:
    spark = index.spark
    stats = index.stats
    num_docs = stats["num_docs"]  # live count — IDF only
    bound = decode_bound(stats)  # EF encode bound — decode only
    avgdl = stats["avgdl"]
    log2q = stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    qmeta, qterm_rows, n_query_terms = _query_plan(queries, k)

    distinct_terms = sorted({t for _, t, _ in qterm_rows})
    # explicit projection so the parquet scan never reads positions_ef
    # (the lazy-positions property, SURVEY.md §4 'Lazy decode').
    # No lexicon join: a term's global df is the sum of its blob dfs,
    # and the fanout delivers ALL of a term's blobs to each qid group,
    # so the kernel derives it with a groupby sum — one broadcast
    # exchange fewer per call.
    matched = index.postings.select(
        "term", "block_id", "df", "cf", "first_docid", "last_docid",
        "docids_ef", "freqs_ef", "q_last_docid", "q_max_tf", "q_min_dl",
    ).where(F.col("term").isin(distinct_terms))
    # literal-map fanout requires terms that embed safely in a sql
    # string (tokenizer output always does); exotic terms fall back to
    # the broadcast-join path rather than risking the expr parser
    _safe = all(
        t.isprintable() and "\n" not in t and "\r" not in t
        for _, t, _ in qterm_rows
    )
    if _safe and len(qterm_rows) <= 2048:
        # small-batch fanout as a LITERAL term->[(qid, w)] map folded
        # into the scan project: no createDataFrame round-trip, no
        # broadcast-join exchange. Built as ONE sql expr string — a
        # single py4j call — because composing it from nested
        # F.struct/F.lit columns costs hundreds of driver round-trips
        # (measured 0.93s plan-build vs 0.26s for the same 24-query
        # batch). The map is O(batch query terms), the same bound as
        # the broadcast it replaces.
        by_term: dict[str, list] = {}
        for qid, t, w in qterm_rows:
            by_term.setdefault(t, []).append((qid, w))

        def _sq(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        map_sql = "map(" + ",".join(
            _sq(t) + ", array(" + ",".join(
                f"named_struct('qid', {int(qid)}L, 'w', {float(w)!r}D)"
                for qid, w in lst
            ) + ")"
            for t, lst in by_term.items()
        ) + ")"
        rows = (
            matched.withColumn("qw", F.explode(F.expr(map_sql)[F.col("term")]))
            .withColumn("qid", F.col("qw.qid"))
            .withColumn("w", F.col("qw.w"))
            .drop("qw")
        )
    else:
        qterms_df = spark.createDataFrame(
            qterm_rows, "qid long, term string, w double"
        )
        rows = matched.join(F.broadcast(qterms_df), "term")

    doclen_bc = index.doclen_broadcast()
    qmeta_bc = spark.sparkContext.broadcast(qmeta)
    nqt_bc = spark.sparkContext.broadcast(n_query_terms)
    # captured by value: the kernel closure runs on executors, where the
    # module-level default would otherwise be re-imported
    sel_min_quanta = QUERY_MAJOR_SELECTIVE_MIN_QUANTA

    def score_one_query(key, pdf):
        qid = int(key[0])
        mode, kq = qmeta_bc.value[qid]
        doclen_arr = doclen_bc.value

        # block-selective decode pays off only on long lists: below this
        # many total quanta the whole-list vectorized decode is cheaper
        # than the mask/pointer machinery (re-measured after the
        # batched multi-run kernel landed; see BASELINE.md addendum and
        # test_bmw_selective_decodes_fewer_quanta)
        total_quanta = int(pdf["q_last_docid"].map(len).sum())
        selective = total_quanta >= sel_min_quanta

        if selective and (
            mode == "conjunctive" or algo in ("bmw", "maxscore")
        ):
            # block-selective decode paths: only quanta that can matter
            # are ever unpacked (conjunctive: quanta holding the rarest
            # term's candidates; BMW: quanta whose metadata bound beats
            # the provisional threshold; MaxScore: non-essential lists
            # probe candidate quanta only)
            tgroups = []
            for term, grp in pdf.groupby("term", sort=True):
                grp = grp.sort_values("block_id")
                gdf = int(grp["df"].sum())  # global df == sum of blob dfs
                w = float(grp["w"].iloc[0])
                tgroups.append((gdf, w * bm25.idf(num_docs, gdf), grp))
            if mode == "conjunctive":
                if len(tgroups) < nqt_bc.value[qid]:
                    docids, scores = np.zeros(0, dtype=np.int64), np.zeros(0)
                else:
                    docids, scores = _conjunctive_selective(
                        tgroups, doclen_arr, avgdl, kq,
                        bound, block_bits, log2q, k1=k1, b=b,
                    )
            elif algo == "maxscore":
                docids, scores = _maxscore_selective(
                    tgroups, doclen_arr, avgdl, kq,
                    bound, block_bits, log2q, k1=k1, b=b,
                )
            else:
                docids, scores = _bmw_selective(
                    tgroups, doclen_arr, avgdl, kq,
                    bound, block_bits, log2q, k1=k1, b=b,
                )
            return pd.DataFrame(
                {
                    "qid": qid,
                    "rank": np.arange(1, len(docids) + 1, dtype=np.int32),
                    "docid": docids,
                    "score": scores,
                }
            )

        terms: list[TermPostings] = []
        for term, grp in pdf.groupby("term", sort=True):
            grp = grp.sort_values("block_id")
            d_parts, f_parts, ql_parts, qt_parts, qd_parts = [], [], [], [], []
            gdf = int(grp["df"].sum())  # global df == sum of blob dfs
            w = float(grp["w"].iloc[0])
            for r in grp.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, bound)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                f = ef.decode_freqs(bytes(r.freqs_ef), df_b, cf_b, log2q)
                d_parts.append(d)
                f_parts.append(f)
                ql_parts.append(np.asarray(r.q_last_docid, dtype=np.int64))
                qt_parts.append(np.asarray(r.q_max_tf, dtype=np.int64))
                qd_parts.append(np.asarray(r.q_min_dl, dtype=np.int64))
            terms.append(
                TermPostings(
                    term=term,
                    idf=w * bm25.idf(num_docs, gdf),
                    docids=np.concatenate(d_parts),
                    tfs=np.concatenate(f_parts),
                    q_last_docid=np.concatenate(ql_parts),
                    q_max_tf=np.concatenate(qt_parts),
                    q_min_dl=np.concatenate(qd_parts),
                )
            )
        if mode == "conjunctive":
            if len(terms) < nqt_bc.value[qid]:
                docids, scores = np.zeros(0, dtype=np.int64), np.zeros(0)
            else:
                docids, scores = bm25.topk_conjunctive(
                    terms, doclen_arr, avgdl, kq, k1=k1, b=b
                )
        else:
            docids, scores = bm25.ALGOS[algo](
                terms, doclen_arr, avgdl, kq, k1=k1, b=b
            )
        return pd.DataFrame(
            {
                "qid": qid,
                "rank": np.arange(1, len(docids) + 1, dtype=np.int32),
                "docid": docids,
                "score": scores,
            }
        )

    scored = rows.groupBy("qid").applyInPandas(
        score_one_query, schema=RESULT_SCHEMA
    )

    # queries whose terms all miss the lexicon produce no group — that is
    # correct (empty result set), matching 'absent term' semantics.
    return scored


def with_docno(index: EFIndex, results: DataFrame) -> DataFrame:
    """Attach docno to (qid, rank, docid, score) results — the final
    metadata lookup of the retrieval lifecycle (the MetaIndex role in
    Terrier; our docno = repo:path@commit8). Partitioned join on docid;
    AQE broadcasts the k·|batch|-row results side, never the docs table."""
    return results.join(index.docs.select("docid", "docno"), "docid").select(
        "qid", "rank", "docid", "docno", "score"
    )


def decode_postings(index: EFIndex, terms: list[str] | None = None) -> DataFrame:
    """Decode to (term, docid, tf) rows — the streaming iterator role
    (EFInvertedIndex.InputIterator, SURVEY.md §2.2 Q9) and the
    round-trip proof surface for the DuckDB oracle. With `terms`, the
    filter is pushed to the parquet scan (row-group pruning on the
    term-range-sorted postings) and each matched blob is decoded exactly
    once — the term_major scorer's decode stage."""
    stats = index.stats
    num_docs, log2q = decode_bound(stats), stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    src = index.postings
    if terms is not None:
        src = src.where(F.col("term").isin(sorted(set(terms))))

    def decode_rows(batches):
        for pdf in batches:
            out_t, out_d, out_f = [], [], []
            for r in pdf.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                f = ef.decode_freqs(bytes(r.freqs_ef), df_b, cf_b, log2q)
                out_t.append(np.repeat(r.term, df_b))
                out_d.append(d)
                out_f.append(f)
            if out_t:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(out_t),
                        "docid": np.concatenate(out_d),
                        "tf": np.concatenate(out_f).astype(np.int32),
                    }
                )

    cols = ["term", "block_id", "df", "cf", "docids_ef", "freqs_ef"]
    return src.select(cols).mapInPandas(
        decode_rows, schema="term string, docid long, tf int"
    )


def _route_candidates(
    index: EFIndex, cand: DataFrame, terms: list[str], cols: list[str]
) -> DataFrame:
    """Shared candidate->block routing for the selective decoders:
    inner-join the (term, docid) candidates onto the postings blocks —
    on (term, block_id = docid >> block_bits) when the index is
    docid-range-blocked — so blocks without candidates are pruned
    before any blob byte is read. Adds a sorted `cands` array column."""
    block_bits = index.stats.get("block_bits")
    src = index.postings.select(*cols).where(
        F.col("term").isin(sorted(set(terms)))
    )
    if block_bits is not None:
        keyed = cand.withColumn("block_id", F.shiftright("docid", block_bits))
        grouped = keyed.groupBy("term", "block_id").agg(
            F.sort_array(F.collect_set("docid")).alias("cands")
        )
        return src.join(grouped, ["term", "block_id"])
    grouped = cand.groupBy("term").agg(
        F.sort_array(F.collect_set("docid")).alias("cands")
    )
    return src.join(grouped, ["term"])


def decode_postings_selective(
    index: EFIndex,
    cand: DataFrame,
    terms: list[str],
    acc: tuple | None = None,
) -> DataFrame:
    """Decode ONLY the quanta that can contain the candidate docids —
    the DISTRIBUTED engine-level skipTo for the term-major strategy
    (reference semantics: EFBasicIterablePosting.next(target) walks skip
    pointers to the containing quantum, DocidReader.java:118-183; here
    the routing is relational).

    `cand` is a (term, docid) relation of sorted-unique candidates per
    term. With a docid-range-blocked index the candidate->block routing
    is an EQUI-join on (term, block_id = docid >> block_bits): blocks
    holding no candidates are pruned by the inner join before a single
    blob byte is read, and within a surviving block only candidate
    quanta are unpacked (q_last_docid grid + searchsorted). Returns
    (term, docid, tf) for candidates PRESENT in the list (membership
    re-checked by exact docid match).

    acc: optional (decoded_quanta, total_quanta) Spark accumulators for
    tests/metrics."""
    stats = index.stats
    num_docs, log2q = decode_bound(stats), stats["log2_quantum"]
    block_bits = stats.get("block_bits")
    acc_dec, acc_tot = acc if acc is not None else (None, None)

    src = _route_candidates(
        index, cand, terms,
        ["term", "block_id", "df", "cf", "first_docid", "last_docid",
         "docids_ef", "freqs_ef", "q_last_docid"],
    )

    def decode_sel(batches):
        for pdf in batches:
            out_t, out_d, out_f = [], [], []
            for r in pdf.itertuples(index=False):
                q_last = np.asarray(r.q_last_docid, dtype=np.int64)
                if acc_tot is not None:
                    acc_tot.add(len(q_last))
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                cands = np.asarray(r.cands, dtype=np.int64)
                cands = cands[
                    (cands >= int(r.first_docid)) & (cands <= int(r.last_docid))
                ]
                if len(cands) == 0:
                    continue
                qidx = np.unique(np.searchsorted(q_last, cands, side="left"))
                qidx = qidx[qidx < len(q_last)]
                if acc_dec is not None:
                    acc_dec.add(len(qidx))
                q_last_rel = q_last - base
                d = ef.decode_docids_quanta_multi(
                    bytes(r.docids_ef), int(r.df), ub, q_last_rel, qidx, log2q
                ) + base
                f = ef.decode_freqs_quanta_multi(
                    bytes(r.freqs_ef), int(r.df), int(r.cf), qidx, log2q
                )
                pos = np.minimum(np.searchsorted(d, cands), len(d) - 1)
                hit = d[pos] == cands
                out_t.append(np.repeat(r.term, int(hit.sum())))
                out_d.append(cands[hit])
                out_f.append(f[pos[hit]])
            if out_t:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(out_t),
                        "docid": np.concatenate(out_d),
                        "tf": np.concatenate(out_f).astype(np.int32),
                    }
                )

    return src.mapInPandas(decode_sel, schema="term string, docid long, tf int")


def decode_postings_by_quanta(index: EFIndex, picks: DataFrame) -> DataFrame:
    """Decode exactly the picked quanta: `picks` is a
    (term, block_id, qidx: array<long> sorted-unique) relation. Returns
    (term, block_id, qpos, docid, tf) — qpos is the quantum each row
    came from, so callers can join decoded rows back to per-query
    quantum selections (the relational BMW's seed/survivor routing).
    Blocks not picked are pruned by the inner join before any byte is
    read; picked quanta decode in one batched kernel pass per block."""
    stats = index.stats
    num_docs, log2q = decode_bound(stats), stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    src = index.postings.select(
        "term", "block_id", "df", "cf", "docids_ef", "freqs_ef", "q_last_docid"
    ).join(picks, ["term", "block_id"])

    def decode_rows(batches):
        for pdf in batches:
            out = {"term": [], "block_id": [], "qpos": [], "docid": [], "tf": []}
            for r in pdf.itertuples(index=False):
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                q_last_rel = np.asarray(r.q_last_docid, dtype=np.int64) - base
                qidx = np.asarray(r.qidx, dtype=np.int64)
                qidx = qidx[qidx < len(q_last_rel)]
                if len(qidx) == 0:
                    continue
                d, idx = ef.decode_docids_quanta_multi(
                    bytes(r.docids_ef), int(r.df), ub, q_last_rel, qidx, log2q,
                    with_indices=True,
                )
                f = ef.decode_freqs_quanta_multi(
                    bytes(r.freqs_ef), int(r.df), int(r.cf), qidx, log2q
                )
                out["term"].append(np.repeat(r.term, len(d)))
                out["block_id"].append(np.full(len(d), int(r.block_id), dtype=np.int64))
                out["qpos"].append(idx >> log2q)
                out["docid"].append(d + base)
                out["tf"].append(f)
            if out["term"]:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(out["term"]),
                        "block_id": np.concatenate(out["block_id"]),
                        "qpos": np.concatenate(out["qpos"]),
                        "docid": np.concatenate(out["docid"]),
                        "tf": np.concatenate(out["tf"]).astype(np.int32),
                    }
                )

    return src.mapInPandas(
        decode_rows,
        schema="term string, block_id long, qpos long, docid long, tf int",
    )


def decode_positions_df(index: EFIndex, terms: list[str] | None = None) -> DataFrame:
    """Decode position blobs to (term, docid, pos) rows — the lazy
    per-posting decode (EFBlockIterablePosting.java:94-106) flattened to
    a relation so positional operators (phrase match) stay declarative.

    Parquet column pruning keeps positions_ef unread for non-positional
    queries (the lazy-decode property, SURVEY.md §4 'Lazy decode')."""
    stats = index.stats
    if not stats.get("has_positions"):
        raise ValueError("index was built without positions")
    num_docs, log2q = decode_bound(stats), stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    src = index.postings
    if terms is not None:
        src = src.where(F.col("term").isin(sorted(set(terms))))

    def decode_rows(batches):
        for pdf in batches:
            out_t, out_d, out_p = [], [], []
            for r in pdf.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                tfs = ef.decode_freqs(bytes(r.freqs_ef), df_b, cf_b, log2q)
                plists = ef.decode_positions(
                    bytes(r.positions_ef), tfs, df_b, int(r.sum_max_pos), log2q
                )
                out_t.append(np.repeat(r.term, int(tfs.sum())))
                out_d.append(np.repeat(d, tfs))
                out_p.append(np.concatenate(plists) if plists else np.zeros(0, np.int64))
            if out_t:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(out_t),
                        "docid": np.concatenate(out_d),
                        "pos": np.concatenate(out_p).astype(np.int64),
                    }
                )

    cols = ["term", "block_id", "df", "cf", "docids_ef", "freqs_ef",
            "positions_ef", "sum_max_pos"]
    return src.select(cols).mapInPandas(
        decode_rows, schema="term string, docid long, pos long"
    )


def decode_positions_selective(
    index: EFIndex, cand: DataFrame, terms: list[str]
) -> DataFrame:
    """(term, docid, pos) rows for candidate (term, docid) pairs ONLY —
    the true lazy positions decode at engine level (reference:
    EFBlockIterablePosting.getPositions reads one posting's segment on
    demand). Candidate->block routing is the same equi-join as
    decode_postings_selective (blocks without candidates never read a
    byte); within a block, candidate postings are located via selective
    DOCID quanta decode, their position-element ranges derived from a
    selective FREQ prefix-sum decode, and only those segments of the
    position sequence are unpacked (ef.decode_positions_ranges)."""
    stats = index.stats
    if not stats.get("has_positions"):
        raise ValueError("index was built without positions")
    num_docs, log2q = decode_bound(stats), stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    src = _route_candidates(
        index, cand, terms,
        ["term", "block_id", "df", "cf", "first_docid", "last_docid",
         "docids_ef", "freqs_ef", "positions_ef", "sum_max_pos",
         "q_last_docid"],
    )

    def decode_sel(batches):
        for pdf in batches:
            out_t, out_d, out_p = [], [], []
            for r in pdf.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                q_last = np.asarray(r.q_last_docid, dtype=np.int64)
                cands = np.asarray(r.cands, dtype=np.int64)
                cands = cands[
                    (cands >= int(r.first_docid)) & (cands <= int(r.last_docid))
                ]
                if len(cands) == 0:
                    continue
                # locate candidate postings: element indices in the list
                qidx = np.unique(np.searchsorted(q_last, cands, side="left"))
                qidx = qidx[qidx < len(q_last)]
                d, idx = ef.decode_docids_quanta_multi(
                    bytes(r.docids_ef), df_b, ub, q_last - base, qidx, log2q,
                    with_indices=True,
                )
                d = d + base
                pos_in = np.minimum(np.searchsorted(d, cands), len(d) - 1)
                hit = d[pos_in] == cands
                pidx = idx[pos_in[hit]]  # global posting indices, ascending
                dd = cands[hit]
                if len(pidx) == 0:
                    continue
                # element ranges from freq prefix sums: s = cps[i-1] + i,
                # tf = cps[i] - cps[i-1] + 1 (strict semantics)
                fq = np.unique(
                    np.concatenate([pidx >> log2q, np.maximum(pidx - 1, 0) >> log2q])
                )
                fout = ef.decode_strict_cps_quanta_multi(
                    bytes(r.freqs_ef), df_b, cf_b, fq, log2q
                )
                if fout is None:
                    fcps = ef.ef_decode_prefix_sums(
                        bytes(r.freqs_ef), df_b, cf_b, strict=True,
                        index_zeroes=False, log2_quantum=log2q,
                    )
                    fidx = np.arange(df_b, dtype=np.int64)
                else:
                    fcps, _, fidx, _, _ = fout
                cps_i = fcps[np.searchsorted(fidx, pidx)]
                prev = np.where(
                    pidx == 0,
                    0,
                    fcps[np.searchsorted(fidx, np.maximum(pidx - 1, 0))],
                )
                s = prev + pidx
                e = s + (cps_i - prev + 1)
                plists = ef.decode_positions_ranges(
                    bytes(r.positions_ef), cf_b, df_b + int(r.sum_max_pos),
                    np.stack([s, e], axis=1), log2q,
                )
                tf_sel = (e - s).astype(np.int64)
                out_t.append(np.repeat(r.term, int(tf_sel.sum())))
                out_d.append(np.repeat(dd, tf_sel))
                out_p.append(
                    np.concatenate(plists) if plists else np.zeros(0, np.int64)
                )
            if out_t:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(out_t),
                        "docid": np.concatenate(out_d),
                        "pos": np.concatenate(out_p).astype(np.int64),
                    }
                )

    return src.mapInPandas(decode_sel, schema="term string, docid long, pos long")
