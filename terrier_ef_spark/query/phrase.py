"""Positional (phrase) queries over the block EF index.

The reference stores positions (the `-b` block index,
EliasFanoBlockEncoders.java:60-87) but phrase matching itself lives in
Terrier core; the published semantics are standard sliding-window exact
phrase: terms must appear at consecutive positions.

Spark-first shape: decode positions to a (term, docid, pos) relation
(one vectorized mapInPandas over only the phrase terms' rows — Parquet
pushes the term filter and prunes non-position columns), then express
the phrase join relationally: anchor = pos - phrase_index; a docid whose
anchor carries every phrase index is one occurrence. That is a pure
groupBy — Catalyst plans the shuffles, AQE handles skew, and the same
SQL runs on the DuckDB oracle verbatim.

Selective positions: a phrase can only match docs containing ALL its
terms, so a hot term's position blob need not be decoded wholesale —
candidates come from the (cheap) docid-list intersection, and
decode_positions_selective unpacks only candidate postings' segments.
Engaged per term when the candidate bound is small relative to the
term's position quanta (same measured break-even family as the
term-major selective scorer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import (
    TERM_MAJOR_SELECTIVE_QUANTA_FACTOR,
    decode_positions_df,
    decode_positions_selective,
    decode_postings,
    decode_postings_selective,
)
from terrier_ef_spark.util import eager_release


def _positions_for(index: EFIndex, terms: list[str], selective: bool | None) -> DataFrame:
    """(term, docid, pos) for the given terms, routing each term through
    whole-list or candidate-selective positions decode."""
    terms = sorted(set(terms))
    if selective is False:
        return decode_positions_df(index, terms=terms)
    lex = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in index.lexicon.select("term", "df", "cf")
        .where(F.col("term").isin(terms))
        .collect()
    }
    if len(lex) < len(terms):
        # some term is absent: no doc can match — empty relation
        return index.spark.createDataFrame([], "term string, docid long, pos long")
    log2q = int(index.stats["log2_quantum"])
    cand_bound = min(df for df, _ in lex.values())
    sel_terms = [
        t
        for t in terms
        if cand_bound * TERM_MAJOR_SELECTIVE_QUANTA_FACTOR < (lex[t][1] >> log2q)
    ]
    if selective is None and not sel_terms:
        return decode_positions_df(index, terms=terms)
    if selective is True and not sel_terms:
        sel_terms = list(terms)  # forced (tests): all terms selective
    full_terms = [t for t in terms if t not in sel_terms]

    # candidates: docs containing ALL the phrase's terms. Only the
    # RAREST term's list is decoded in full; every other term checks
    # membership via selective (candidate-quanta) decode — the same
    # skip shape as engine._decode_for_batch, so a hot term's docid and
    # freq blobs are never unpacked wholesale on this path either.
    spark = index.spark
    rarest = min(terms, key=lambda t: (lex[t][0], t))
    cand_docs = decode_postings(index, terms=[rarest]).select("docid")
    others = [t for t in terms if t != rarest]
    if others:
        ot_df = spark.createDataFrame([(t,) for t in others], "term string")
        probe = cand_docs.crossJoin(F.broadcast(ot_df)).select("term", "docid")
        hits = decode_postings_selective(index, probe, others)
        cand_docs = (
            hits.groupBy("docid")
            .agg(F.count_distinct("term").alias("nt"))
            .where(F.col("nt") == len(others))
            .select("docid")
        )
    terms_df = spark.createDataFrame([(t,) for t in sel_terms], "term string")
    cand = cand_docs.crossJoin(F.broadcast(terms_df)).select("term", "docid")
    pos_rows = decode_positions_selective(index, cand, sel_terms)
    if full_terms:
        pos_rows = pos_rows.unionByName(
            decode_positions_df(index, terms=full_terms)
        )
    return pos_rows


def phrase_hits(
    index: EFIndex, phrase: list[str], selective: bool | None = None
) -> DataFrame:
    """All docs containing the exact phrase, unranked: (docid,
    n_occurrences) — the constraint relation the query language's
    quoted-phrase operator filters candidates with (parser.py), and the
    body phrase_match ranks. Duplicate terms are handled via the
    distinct phrase-index count (a doc position must anchor ALL
    indices). selective: None = auto per-term cutover, True/False =
    force."""
    spark = index.spark
    n = len(phrase)
    phrase_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "term string, idx int"
    )
    pos_rows = _positions_for(index, phrase, selective)
    occ = (
        pos_rows.join(F.broadcast(phrase_df), "term")
        .groupBy("docid", (F.col("pos") - F.col("idx")).alias("anchor"))
        .agg(F.count_distinct("idx").alias("nidx"))
        .where(F.col("nidx") == n)
    )
    return occ.groupBy("docid").agg(F.count(F.lit(1)).alias("n_occurrences"))


def window_hits(
    index: EFIndex,
    terms: list[str],
    window: int,
    selective: bool | None = None,
) -> DataFrame:
    """All docs where some position window of span <= `window` contains
    ALL the (distinct) terms — the unordered-window constraint behind
    the query language's `"a b"~N` operator, generalizing
    proximity_match's two-term predicate (for two terms, span <= N is
    exactly |pos_a - pos_b| <= N). Returns (docid, n_occurrences) where
    n_occurrences counts anchor positions opening a qualifying window.

    Relational shape: one positional decode of only the query terms'
    rows, then a per-doc RANGE window [pos, pos + window] checking
    distinct-term coverage — a single partitionBy(docid) sort, no
    self-join fan-out (the pairwise join is quadratic in per-doc tf;
    this is linear in the terms' position rows)."""
    terms = list(terms)
    if len(set(terms)) != len(terms):
        raise ValueError("window_hits requires distinct terms")
    if window < 1:
        raise ValueError("window must be >= 1")
    pos_rows = _positions_for(index, terms, selective)
    w = (
        Window.partitionBy("docid")
        .orderBy(F.col("pos").cast("long"))
        .rangeBetween(0, int(window))
    )
    anchors = pos_rows.withColumn(
        "ncover", F.size(F.collect_set("term").over(w))
    ).where(F.col("ncover") == len(terms))
    return anchors.groupBy("docid").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def phrase_match(
    index: EFIndex, phrase: list[str], k: int = 20, selective: bool | None = None
) -> DataFrame:
    """Top-k docs by exact-phrase occurrence count.

    Returns (docid, n_occurrences, rank); tie-break (count desc, docid
    asc). See phrase_hits for the matching semantics."""
    return _rank_hits(phrase_hits(index, phrase, selective), k)


def _rank_hits(hits: DataFrame, k: int) -> DataFrame:
    # distributed TakeOrdered first; the single-partition ranking window
    # then sees at most k rows
    top = hits.orderBy(F.desc("n_occurrences"), F.asc("docid")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("docid"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "docid", "n_occurrences", "rank"
    )


def proximity_match(
    index: EFIndex,
    term_a: str,
    term_b: str,
    window: int = 5,
    k: int = 20,
    selective: bool | None = None,
) -> DataFrame:
    """Top-k docs by count of (pos_a, pos_b) co-occurrences with
    |pos_a - pos_b| <= window — the unordered-proximity companion to
    phrase_match, on the same positional decode. Distinct terms only
    (a self-proximity query is a different operator)."""
    if term_a == term_b:
        raise ValueError("proximity_match requires two distinct terms")
    rows = _positions_for(index, [term_a, term_b], selective)
    # persist: both join sides read this; without it the positional
    # decode would run twice. Released via eager_release below — the
    # returned top-k is materialized once and the decode cache freed.
    pos_rows = rows.persist()
    a = pos_rows.where(F.col("term") == term_a).select(
        "docid", F.col("pos").alias("pos_a")
    )
    b = pos_rows.where(F.col("term") == term_b).select(
        "docid", F.col("pos").alias("pos_b")
    )
    pairs = a.join(b, "docid").where(
        F.abs(F.col("pos_a") - F.col("pos_b")) <= window
    )
    hits = pairs.groupBy("docid").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return eager_release(_rank_hits(hits, k), pos_rows)


def run_queries_bm25_prox(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    depth: int = 20,
    window: int = 4,
    fetch: int = 100,
) -> DataFrame:
    """Proximity-boosted BM25 re-ranking (Rasolofo & Savoy, ECIR 2003
    "Term proximity scoring for keyword-based retrieval systems" — the
    role Terrier fills with its dependence-score modifiers): take the
    base BM25 top-`depth` per query, and for every unordered query-term
    pair co-occurring within `window` positions in a candidate doc add

        tpi(d,a,b) = sum over occurrence pairs 1/(pos_a - pos_b)^2
        prox(d)    = sum_pairs min(idf_a, idf_b)+ * tpi*(k1+1)/(tpi+k1)
        final(d)   = bm25(d) + prox(d)

    (idf clamped at 0: a stopword-frequency term contributes no boost,
    never a penalty). The candidate cut is by (round(score,6) desc,
    docid) over a deeper `fetch` so the set is reproducible across
    engines; positions decode is candidate-routed — only the top-depth
    docs' position segments are ever unpacked, so the re-rank cost is
    O(queries * depth * tf^2-in-window), corpus-size independent."""
    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.engine import run_queries

    spark = index.spark
    num_docs = float(index.stats["num_docs"])
    deep = run_queries(index, queries, k=fetch, strategy="term_major")
    wq = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid")
    )
    base = (
        deep.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= depth)
        .select("qid", "docid", "score")
        .persist()
    )

    qterm_rows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    qterms_df = spark.createDataFrame(qterm_rows, "qid long, term string")
    terms = sorted({t for _, t in qterm_rows})

    cand = (
        base.join(F.broadcast(qterms_df), "qid")
        .select("term", "docid").distinct()
    )
    pos = decode_positions_selective(index, cand, terms)
    # (qid, term, docid, pos) restricted to each query's own candidates
    posq = (
        pos.join(F.broadcast(qterms_df), "term")
        .join(base.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .persist()
    )

    idf = F.greatest(
        F.log2((F.lit(num_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        F.lit(0.0),
    )
    lex = index.lexicon.where(F.col("term").isin(terms)).select(
        "term", idf.alias("idf")
    )
    a = posq.select("qid", "docid", F.col("term").alias("ta"),
                    F.col("pos").alias("pa"))
    b = posq.select("qid", "docid", F.col("term").alias("tb"),
                    F.col("pos").alias("pb"))
    pairs = (
        a.join(b, ["qid", "docid"])
        .where(
            (F.col("ta") < F.col("tb"))
            & (F.abs(F.col("pa") - F.col("pb")) <= window)
        )
        .groupBy("qid", "docid", "ta", "tb")
        .agg(
            F.sum(
                1.0 / ((F.col("pa") - F.col("pb"))
                       * (F.col("pa") - F.col("pb")))
            ).alias("tpi")
        )
    )
    prox = (
        pairs.join(F.broadcast(lex.withColumnRenamed("term", "ta")
                               .withColumnRenamed("idf", "idf_a")), "ta")
        .join(F.broadcast(lex.withColumnRenamed("term", "tb")
                          .withColumnRenamed("idf", "idf_b")), "tb")
        .select(
            "qid", "docid",
            (
                F.least("idf_a", "idf_b")
                * F.col("tpi") * (bm25.K1 + 1) / (F.col("tpi") + bm25.K1)
            ).alias("boost"),
        )
        .groupBy("qid", "docid")
        .agg(F.sum("boost").alias("prox"))
    )
    final = base.join(prox, ["qid", "docid"], "left").select(
        "qid", "docid",
        (F.col("score") + F.coalesce(F.col("prox"), F.lit(0.0))).alias("score"),
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    out = (
        final.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
    return eager_release(out, base, posq)
