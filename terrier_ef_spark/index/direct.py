"""Direct (forward) index — the inverted→direct transpose.

Reference: Invert2Direct.java:100-186 iterates the whole inverted file
in docid windows bounded by processTokens=1e8 (a heap bound), collects
(termid, tf) per doc, and EF-encodes each doc's two sequences via
DirectIndexWriter.java:74-94:

- termids: gap-coded, non-strict, indexZeroes, upper bound = numTerms
  (same sequence shape as docid lists, incl. trailing sentinel);
- tfs: strict, forward pointers, upper bound = doclen (== sum of tfs).

Spark restructuring (SURVEY.md §3 E3): the token-window outer loop IS
the shuffle — decode the inverted postings with mapInPandas, re-key by
docid with one groupBy, and EF-encode per doc in applyInPandas. The
termid dictionary rides a broadcast join (the 'aligned termids'
precondition, Invert2Direct.java:110-124, holds by construction: our
lexicon termid is the dense rank in term order).

At 10^12-file scale the groupBy(docid) shuffle is bounded per-group by
the number of distinct terms in one document (thousands), so no group
can blow an executor — docid is never skewed the way terms are; no
salting is needed on this path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_postings

DIRECT_SCHEMA = (
    "docid long, count int, doclen int, termids_ef binary, tfs_ef binary"
)


def _direct_meta(stats: dict) -> dict:
    """Fingerprint of the source inverted index a direct build derives
    from; a direct/ dir whose recorded fingerprint no longer matches is
    stale (e.g. after incremental_build extended the postings) and must
    be rebuilt — decoding old blobs with the new num_terms upper bound
    would silently produce garbage termids."""
    return {
        "num_terms": int(stats["num_terms"]),
        "num_postings": int(stats["num_postings"]),
        "num_docs": int(stats["num_docs"]),
        "log2_quantum": int(stats["log2_quantum"]),
    }


def build_direct(index: EFIndex, *, n_partitions: int = 32, resume: bool = True) -> DataFrame:
    """Build the forward index parquet from an existing EF inverted
    index; returns its DataFrame. Resumable like the build stages
    (skipped when the _SUCCESS marker exists AND the recorded source
    fingerprint still matches the inverted index's stats)."""
    out = os.path.join(index.paths.root, "direct")
    meta_path = os.path.join(index.paths.root, "direct_meta.json")
    meta = _direct_meta(index.stats)
    if resume and os.path.exists(os.path.join(out, "_SUCCESS")):
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                if json.load(fh) == meta:
                    return index.spark.read.parquet(out)

    stats = index.stats
    num_terms = int(stats["num_terms"])
    log2q = int(stats["log2_quantum"])

    termids = index.lexicon.select("term", "termid")
    rows = decode_postings(index).join(F.broadcast(termids), "term")

    def encode_doc(key, pdf):
        docid = int(key[0])
        pdf = pdf.sort_values("termid")
        tids = pdf["termid"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        doclen = int(tfs.sum())
        return pd.DataFrame(
            [
                {
                    "docid": docid,
                    "count": len(tids),
                    "doclen": doclen,
                    # same encoders as the inverted side, per
                    # DirectIndexWriter.java:86-93 (termid gaps /
                    # strict tfs with ub=doclen)
                    "termids_ef": ef.encode_docids(tids, num_terms, log2q),
                    "tfs_ef": ef.encode_freqs(tfs, doclen, log2q),
                }
            ]
        )

    direct = rows.groupBy("docid").applyInPandas(
        encode_doc, schema=DIRECT_SCHEMA
    ).persist()  # encode once; repartitionByRange sampling reads the cache
    (direct.repartitionByRange(n_partitions, "docid")
           .sortWithinPartitions("docid")
           .write.mode("overwrite").parquet(out))
    direct.unpersist()
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return index.spark.read.parquet(out)


def decode_direct(index: EFIndex, direct: DataFrame | None = None) -> DataFrame:
    """Decode the forward index back to (docid, termid, tf) rows — the
    EFDirectIndex cursor role (EFDirectIndex.java:95-114), vectorized
    whole-doc instead of per-posting."""
    if direct is None:
        direct = index.spark.read.parquet(os.path.join(index.paths.root, "direct"))
    num_terms = int(index.stats["num_terms"])
    log2q = int(index.stats["log2_quantum"])

    def decode_rows(batches):
        for pdf in batches:
            out_doc, out_tid, out_tf = [], [], []
            for r in pdf.itertuples(index=False):
                n = int(r.count)
                tids = ef.decode_docids(bytes(r.termids_ef), n, num_terms, log2q)
                tfs = ef.decode_freqs(bytes(r.tfs_ef), n, int(r.doclen), log2q)
                out_doc.append(np.full(n, r.docid, dtype=np.int64))
                out_tid.append(tids)
                out_tf.append(tfs)
            if out_doc:
                yield pd.DataFrame(
                    {
                        "docid": np.concatenate(out_doc),
                        "termid": np.concatenate(out_tid),
                        "tf": np.concatenate(out_tf).astype(np.int32),
                    }
                )

    return direct.select("docid", "count", "doclen", "termids_ef", "tfs_ef").mapInPandas(
        decode_rows, schema="docid long, termid long, tf int"
    )
