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


def phrase_match(
    index: EFIndex, phrase: list[str], k: int = 20, selective: bool | None = None
) -> DataFrame:
    """Top-k docs by exact-phrase occurrence count.

    Returns (docid, n_occurrences, rank); tie-break (count desc, docid
    asc). Duplicate terms in the phrase are handled via the distinct
    phrase-index count (a doc position must anchor ALL indices).
    selective: None = auto per-term cutover, True/False = force."""
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
    hits = occ.groupBy("docid").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return _rank_hits(hits, k)


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
