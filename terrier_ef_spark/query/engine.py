"""Query execution over the EF index — the Spark restructuring of the
retrieval lifecycle (SURVEY.md §3 E2):

    query terms --(broadcast lookup, role of the lexicon binary search
    Q5)--> matched postings rows (parquet term-range pruning + pushed
    filter) --repartition by qid--> per-query applyInPandas kernel
    (decode EF blobs + BM25 top-k in NumPy) --> (qid, rank, docid, score)

One shuffle moves only the matched blobs; doc lengths ride a Spark
broadcast (the reference loads them fully in RAM too,
EFDocumentIndex.java:43-47). The whole query batch is one Spark job —
the q/s bench path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import block_upper_bound
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query import bm25
from terrier_ef_spark.query.bm25 import TermPostings

RESULT_SCHEMA = "qid long, rank int, docid long, score double"


def run_queries(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    algo: str = "naive",
) -> DataFrame:
    """queries: [{'qid': int, 'terms': [str], 'mode': 'disjunctive'|'conjunctive'}].

    Returns (qid, rank, docid, score), rank 1-based, tie-break
    (score desc, docid asc)."""
    spark = index.spark
    # Arrow batch sizing is session-level config (set in session.get_spark)
    # — NOT mutated here: run_queries returns a lazy DataFrame, so a
    # scoped set/restore would be ineffective at collect time, and a
    # permanent set would leak into unrelated workloads on the session.
    stats = index.stats
    num_docs = stats["num_docs"]
    avgdl = stats["avgdl"]
    log2q = stats["log2_quantum"]
    block_bits = stats.get("block_bits")

    qmeta = {int(q["qid"]): (q.get("mode", "disjunctive"), int(q.get("k", k))) for q in queries}
    qterm_rows = [
        (int(q["qid"]), t) for q in queries for t in dict.fromkeys(q["terms"])
    ]
    n_query_terms = {qid: 0 for qid in qmeta}
    for qid, _ in qterm_rows:
        n_query_terms[qid] += 1
    qterms_df = spark.createDataFrame(qterm_rows, "qid long, term string")

    distinct_terms = sorted({t for _, t in qterm_rows})
    # explicit projection so the parquet scan never reads positions_ef
    # (the lazy-positions property, SURVEY.md §4 'Lazy decode')
    matched = index.postings.select(
        "term", "block_id", "df", "cf", "docids_ef", "freqs_ef",
        "q_last_docid", "q_max_tf", "q_min_dl",
    ).where(F.col("term").isin(distinct_terms))
    lex = index.lexicon.select("term", F.col("df").alias("global_df")).where(
        F.col("term").isin(distinct_terms)
    )
    matched = matched.join(F.broadcast(lex), "term")
    rows = matched.join(F.broadcast(qterms_df), "term")

    doclen_bc = spark.sparkContext.broadcast(index.doclen_array())
    qmeta_bc = spark.sparkContext.broadcast(qmeta)
    nqt_bc = spark.sparkContext.broadcast(n_query_terms)

    def score_one_query(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        mode, kq = qmeta_bc.value[qid]
        doclen_arr = doclen_bc.value
        terms: list[TermPostings] = []
        for term, grp in pdf.groupby("term", sort=True):
            grp = grp.sort_values("block_id")
            d_parts, f_parts, ql_parts, qt_parts, qd_parts = [], [], [], [], []
            gdf = int(grp["global_df"].iloc[0])
            for r in grp.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = 0 if block_bits is None else int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
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
                    idf=bm25.idf(num_docs, gdf),
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
                docids, scores = bm25.topk_conjunctive(terms, doclen_arr, avgdl, kq)
        else:
            docids, scores = bm25.ALGOS[algo](terms, doclen_arr, avgdl, kq)
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


def decode_postings(index: EFIndex) -> DataFrame:
    """Full-index decode to (term, docid, tf) rows — the streaming
    iterator role (EFInvertedIndex.InputIterator, SURVEY.md §2.2 Q9)
    and the round-trip proof surface for the DuckDB oracle."""
    stats = index.stats
    num_docs, log2q = stats["num_docs"], stats["log2_quantum"]
    block_bits = stats.get("block_bits")

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
    return index.postings.select(cols).mapInPandas(
        decode_rows, schema="term string, docid long, tf int"
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
    num_docs, log2q = stats["num_docs"], stats["log2_quantum"]
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
