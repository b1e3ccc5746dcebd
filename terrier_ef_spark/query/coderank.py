"""Composed code-search ranking: BM25 + symbol-definition boost +
path-match boost in ONE exact scoring pass — the default ranking a
Zoekt-style engine serves (content relevance, definitions outrank
body mentions, filename matches outrank both and can enter with no
content hit at all).

The two evidence channels (query/symbols.py, query/pathrank.py) each
produce a (qid, docid, boost) relation; `combine_boost_pairs` unions
and SUM-folds them — load-bearing, because the engine's duplicate
fold is max() (a dedup guard), so additive multi-channel evidence
must be pre-summed to one row per pair. The combined relation rides
the engine's full-outer boost channel (boost_unmatched=True): a
filename-only doc enters at score = path_boost, a defining doc gets
its symbol increment on top of BM25, and everything lands BEFORE
top-k truncation — exact at any k, with tombstones and doc_filter
re-bound on entering rows.

100 TB shape: each channel is a bounded relation (defs and path
tokens matching the query's ~handful of terms), built with the term
set pushed into its scan; the union-fold shuffles only those rows.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["combine_boost_pairs", "run_queries_code_rank"]


def combine_boost_pairs(*pair_frames: DataFrame) -> DataFrame:
    """Union (qid, docid, boost) relations and SUM per pair. The
    engine folds duplicate boost rows with max() (duplicate
    tolerance, not accumulation), so additive channels must be
    pre-summed here — one row per (qid, docid) makes max a no-op."""
    if not pair_frames:
        raise ValueError("combine_boost_pairs: no channels given")
    frames = [p.select("qid", "docid", "boost") for p in pair_frames]
    return (
        reduce(DataFrame.unionByName, frames)
        .groupBy("qid", "docid")
        .agg(F.sum("boost").alias("boost"))
    )


def run_queries_code_rank(
    index,
    symbols: DataFrame,
    meta: DataFrame,
    queries: list[dict],
    *,
    k: int = 10,
    sym_beta: float = 1.0,
    path_beta: float = 0.5,
    **kwargs,
) -> DataFrame:
    """score(q, d) = BM25(q, d)
                   + sym_beta  x |{t in q : d defines t as a symbol}|
                   + path_beta x |{t in q : t in path_tokens(d)}|
    with BM25 = 0 for content-missing docs (they enter through the
    path channel — the filename-only class). symbols: the
    extract_symbols relation; meta: the (doc_id, path) metadata
    relation. kwargs pass through to run_queries (model, k1/b, ...)."""
    from .engine import run_queries
    from .pathrank import path_term_pairs
    from .symbols import symbol_boost_pairs

    bp = combine_boost_pairs(
        symbol_boost_pairs(symbols, queries, beta=sym_beta),
        path_term_pairs(meta, queries, beta=path_beta),
    )
    return run_queries(
        index, queries, k=k, boost_pairs=bp, boost_unmatched=True, **kwargs
    )
