"""Sequential Dependence Model (Metzler & Croft, SIGIR 2005) over the
positional block EF index.

The reference's index family stores positions (EliasFanoBlockEncoders
.java:60-87) precisely so that dependence models can read term
proximity at query time; SDM is the canonical such model (the Markov
random field with sequential cliques, shipped as `pt.rewrite.SDM` /
Indri's `#weight(#combine ... #1 ... #uw8 ...)`). Three feature
families per query:

  T — each query unigram q_i           (weight lambda_T, default 0.85)
  O — each ADJACENT pair (q_i, q_i+1) matched as an exact ordered
      bigram, Indri's #1                (lambda_O, default 0.10)
  U — the same pair co-occurring inside an unordered window of
      `window` positions, Indri's #uwN  (lambda_U, default 0.05)

Each feature is scored as a Dirichlet-smoothed log probability with
the feature's own EXACT collection frequency (Galago-style — the
per-doc counts are summed over the whole collection, not sampled),
in the same per-matched-feature decomposition the engine's
'lm_dirichlet' model uses (Lucene LMDirichletSimilarity):

  contrib = log2(1 + count / (mu * cf_f / C)) + log2(mu / (dl + mu))

summed per (qid, docid) with the lambda weights. A feature absent
from a document contributes nothing (matched-feature convention); a
bigram feature that never occurs in the collection (cf_f = 0) has no
background probability and is dropped from the query, as when Indri
prunes an empty #1 node.

Spark-first shape, one batch = one plan: ONE postings decode over the
batch's distinct unigrams and ONE positional decode over the distinct
bigram terms feed every feature (the hot-term selective path adds one
docid-only postings decode to derive per-bigram candidates — position
bytes, the expensive stream, are still probed selectively). Ordered-bigram counts are the
anchor groupBy of phrase_hits generalized to all bigrams at once
(anchor = pos - idx, both indices present); unordered-window counts
are window_hits' per-doc RANGE window generalized with a bg_id
partition key. Feature -> query fanout rides broadcast literal
frames; collection frequencies stay relational (a groupBy re-joined
on bg_id, never collected). No per-topic Spark jobs, no self-joins
(the RANGE window is linear in position rows where a pairwise
position join would be quadratic in per-doc tf)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import (
    LM_MU,
    TERM_MAJOR_SELECTIVE_QUANTA_FACTOR,
    decode_positions_df,
    decode_positions_selective,
    decode_postings,
)
from terrier_ef_spark.util import eager_release

LAMBDA_T = 0.85
LAMBDA_O = 0.10
LAMBDA_U = 0.05
SDM_WINDOW = 8


def _positions_for_bigrams(
    index: EFIndex,
    bg_ids: dict[tuple[str, str], int],
    selective: bool | None,
) -> DataFrame:
    """(term, docid, pos) rows sufficient for every bigram's ordered
    and unordered counts, routing HOT terms through candidate-selective
    positions decode: a bigram can only score in docs containing BOTH
    its members, so a hot term's position stream is probed only at the
    docids of its bigrams' postings intersections (the same break-even
    family as phrase._positions_for, batched over all bigrams — SDM on
    "the query" at 10^9 docs must not unpack "the"'s positions
    wholesale). Exactness is preserved: each bigram's candidate set
    covers every doc where it can occur, so the per-feature collection
    frequencies stay exact."""
    spark = index.spark
    terms = sorted({t for pair in bg_ids for t in pair})
    if selective is False:
        return decode_positions_df(index, terms=terms)
    lex = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in index.lexicon.select("term", "df", "cf")
        .where(F.col("term").isin(terms))
        .collect()
    }
    # bigrams with an absent member can never match — no probe needed
    live_bgs = {
        pair: bg for pair, bg in bg_ids.items()
        if all(t in lex for t in pair)
    }
    if not live_bgs:
        return spark.createDataFrame([], "term string, docid long, pos long")
    log2q = int(index.stats["log2_quantum"])
    # driver-side probe bound per term: a bigram's candidates are at
    # most min(df of members); a term appearing in several bigrams is
    # probed at their union, bounded by the sum
    bound: dict[str, int] = {}
    for pair in live_bgs:
        cand = min(lex[t][0] for t in pair)
        for t in set(pair):
            bound[t] = bound.get(t, 0) + cand
    sel_terms = sorted(
        t for t in terms
        if t in lex
        and bound.get(t, 0) * TERM_MAJOR_SELECTIVE_QUANTA_FACTOR
        < (lex[t][1] >> log2q)
    )
    if selective is None and not sel_terms:
        return decode_positions_df(index, terms=sorted(set(lex)))
    if selective is True and not sel_terms:
        sel_terms = sorted(set(lex))  # forced (tests): all selective
    full_terms = sorted(t for t in lex if t not in sel_terms)

    # candidate docids per bigram touching a selective term, from the
    # (cheap) docid-list intersection — the postings decode here reads
    # docid/freq blobs only, never position bytes
    need = {
        pair: bg for pair, bg in live_bgs.items()
        if any(t in sel_terms for t in pair)
    }
    mterms = sorted({t for pair in need for t in pair})
    bgmem = spark.createDataFrame(
        [(bg, t, i) for (pair, bg) in need.items()
         for i, t in enumerate(pair)],
        "bg long, term string, idx int",
    )
    posts = decode_postings(index, mterms).select("term", "docid")
    cand = (
        posts.join(F.broadcast(bgmem), "term")
        .groupBy("bg", "docid")
        .agg(F.count_distinct("idx").alias("nidx"))
        .where(F.col("nidx") == 2)
        .select("bg", "docid")
    )
    probe = (
        cand.join(
            F.broadcast(bgmem.where(F.col("term").isin(sel_terms))), "bg"
        )
        .select("term", "docid")
        .distinct()
    )
    pos_rows = decode_positions_selective(index, probe, sel_terms)
    if full_terms:
        pos_rows = pos_rows.unionByName(
            decode_positions_df(index, terms=full_terms)
        )
    return pos_rows


def run_queries_sdm(
    index: EFIndex,
    queries: list[dict],
    k: int = 10,
    mu: float = LM_MU,
    lambdas: tuple[float, float, float] = (LAMBDA_T, LAMBDA_O, LAMBDA_U),
    window: int = SDM_WINDOW,
    selective: bool | None = None,
) -> DataFrame:
    """Top-k SDM retrieval for a batch of queries
    [{"qid": int, "terms": [str, ...]}] -> (qid, rank, docid, score).

    Repeated unigrams aggregate weight (qtf, as run_queries does);
    repeated bigram pairs likewise. An adjacent repeated term
    ("to to") is rejected — the unordered-window feature is not
    defined for a single distinct term (Indri's #uwN requires
    distinct instances; the degenerate pair adds no evidence beyond
    the unigram) — a documented boundary, like the fielded QL's."""
    if not queries:
        raise ValueError("empty query batch")
    lam_t, lam_o, lam_u = (float(x) for x in lambdas)
    spark = index.spark
    stats = index.stats
    num_tokens = float(stats["num_tokens"])
    mu = float(mu)

    # ---- feature tables (driver-side, O(batch terms)) ----
    uni_w: dict[tuple[int, str], float] = {}
    bg_ids: dict[tuple[str, str], int] = {}
    bg_w: dict[tuple[int, int], float] = {}
    for q in queries:
        qid, terms = int(q["qid"]), list(q["terms"])
        if not terms:
            raise ValueError(f"qid {qid}: empty term list")
        for t in terms:
            uni_w[(qid, t)] = uni_w.get((qid, t), 0.0) + 1.0
        for a, b_ in zip(terms, terms[1:]):
            if a == b_:
                raise ValueError(
                    f"qid {qid}: adjacent repeated term {a!r} — the "
                    "unordered-window feature needs two distinct terms"
                )
            bg = bg_ids.setdefault((a, b_), len(bg_ids))
            bg_w[(qid, bg)] = bg_w.get((qid, bg), 0.0) + 1.0

    uterms = sorted({t for _, t in uni_w})

    # background log2(mu/(dl+mu)) factors once per relation
    def _contrib(count, cf):
        p_c = cf / F.lit(num_tokens)
        return F.log2(1 + count / (F.lit(mu) * p_c)) + F.log2(
            F.lit(mu) / (F.col("doclen") + F.lit(mu))
        )

    doclens = index.docs.select("docid", F.col("doclen").cast("double").alias("doclen"))

    # ---- T: unigram Dirichlet contributions ----
    lex = index.lexicon.select(
        "term", F.col("cf").cast("double").alias("global_cf")
    ).where(F.col("term").isin(uterms))
    uq = spark.createDataFrame(
        [(qid, t, w) for (qid, t), w in sorted(uni_w.items())],
        "qid long, term string, w double",
    )
    t_rows = (
        decode_postings(index, uterms)
        .join(F.broadcast(lex), "term")
        .join(doclens, "docid")
        .join(F.broadcast(uq), "term")
        .select(
            "qid",
            "docid",
            (
                _contrib(F.col("tf").cast("double"), F.col("global_cf"))
                * F.col("w")
                * F.lit(lam_t)
            ).alias("wcontrib"),
        )
    )

    contrib_rows = t_rows
    pos_rows = None
    if bg_ids:
        # ---- one positional decode feeds both O and U (hot terms
        # candidate-selective; see _positions_for_bigrams) ----
        pos_rows = _positions_for_bigrams(index, bg_ids, selective).persist()
        bgmem = spark.createDataFrame(
            [(bg, t, i) for (pair, bg) in bg_ids.items()
             for i, t in enumerate(pair)],
            "bg long, term string, idx int",
        )

        # O: exact ordered adjacency — phrase_hits' anchor groupBy,
        # batched over every bigram via the broadcast member frame
        ocnt = (
            pos_rows.join(F.broadcast(bgmem), "term")
            .groupBy("bg", "docid", (F.col("pos") - F.col("idx")).alias("anchor"))
            .agg(F.count_distinct("idx").alias("nidx"))
            .where(F.col("nidx") == 2)
            .groupBy("bg", "docid")
            .agg(F.count(F.lit(1)).cast("double").alias("count"))
        )

        # U: window_hits' RANGE window with bg in the partition key —
        # an anchor row opens a qualifying window when both terms
        # appear in [pos, pos + window]
        wnd = (
            Window.partitionBy("bg", "docid")
            .orderBy(F.col("pos").cast("long"))
            .rangeBetween(0, int(window))
        )
        ucnt = (
            pos_rows.join(F.broadcast(bgmem.select("bg", "term")), "term")
            .withColumn("ncover", F.size(F.collect_set("term").over(wnd)))
            .where(F.col("ncover") == 2)
            .groupBy("bg", "docid")
            .agg(F.count(F.lit(1)).cast("double").alias("count"))
        )

        bq = spark.createDataFrame(
            [(qid, bg, w) for (qid, bg), w in sorted(bg_w.items())],
            "qid long, bg long, w double",
        )
        for cnt, lam in ((ocnt, lam_o), (ucnt, lam_u)):
            # exact collection frequency of each feature: sum of the
            # per-doc counts, re-joined relationally (cf = 0 features
            # simply have no rows and drop out)
            cf_rel = cnt.groupBy("bg").agg(F.sum("count").alias("global_cf"))
            rows = (
                cnt.join(F.broadcast(cf_rel), "bg")
                .join(doclens, "docid")
                .join(F.broadcast(bq), "bg")
                .select(
                    "qid",
                    "docid",
                    (
                        _contrib(F.col("count"), F.col("global_cf"))
                        * F.col("w")
                        * F.lit(lam)
                    ).alias("wcontrib"),
                )
            )
            contrib_rows = contrib_rows.unionByName(rows)

    scored = contrib_rows.groupBy("qid", "docid").agg(
        F.sum("wcontrib").alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("qid", "rank", "docid", "score")
    )
    if pos_rows is not None:
        out = eager_release(out, pos_rows)
    return out
