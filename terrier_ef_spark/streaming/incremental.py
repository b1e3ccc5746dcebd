"""Incremental (streaming) index construction via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.4); this is the
`Trigger.AvailableNow` file-ingestion idiom it anticipates: new corpus
parquet files land in a directory, each micro-batch is tokenized and
EF-encoded into per-epoch postings parts, and a finalize pass compacts
the parts into the exact same index layout `build_index` produces.

Why this works incrementally: blocked blobs are bounded by the block
width alone (`block_upper_bound`), so a posting block encoded from a
micro-batch is byte-identical to the one a full batch rebuild would
produce — no dependency on global num_docs/avgdl at encode time. BMW
metadata (q_max_tf, q_min_dl) is likewise collection-independent, and
the position sequence's upper bound (num + sumMaxPos,
EliasFanoBlockEncoders.java:60-73) depends only on the block's own
postings, so positional indexes stream identically.

Input contract: rows carry a globally-unique `doc_id`; each doc appears
in exactly one file. Blocks that straddle a micro-batch boundary are
merged (decode → concat → re-encode) during finalize, so arrival order
and batch sizing never change the final index.

Scale shape: parts carry a transient per-posting `doclens` column
(emitted by the encode kernel) so the straddled-block merge can rebuild
q_min_dl without any per-doc broadcast — nothing in this path touches a
driver-side dense array (the r01 scale-killer at `_compact`).

Exactly-once: per-epoch parts are written with overwrite (idempotent on
retry); the stream checkpoint lives under the index root; finalize
rewrites the canonical postings dir in one committed parquet job.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import (
    FORMAT_VERSION,
    POSTINGS_SCHEMA,
    IndexPaths,
    finalize_index,
    make_docs_df,
    make_encoded_df,
)
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.tokenizer import make_tokenizer

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string,"
    " content string, doc_id long"
)


def incremental_build(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    block_bits: int = 16,
    log2_quantum: int = ef.DEFAULT_LOG2_QUANTUM,
    n_partitions: int = 16,
    tokenizer: str = "simple",
    positions: bool = False,
    max_files_per_trigger: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> EFIndex:
    """Consume all corpus parquet currently in input_dir
    (Trigger.AvailableNow), append-encode postings per micro-batch, then
    compact + finalize. Re-running after new files land extends the
    index (the stream checkpoint skips already-ingested files; finalize
    recomputes lexicon/stats from all parts)."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(paths.params, "w") as fh:
        json.dump(
            {
                "format": FORMAT_VERSION,
                "log2_quantum": log2_quantum,
                "positions": positions,
                "block_bits": block_bits,
                "n_partitions": n_partitions,
                "tokenizer": tokenizer,
                "streaming": True,
            },
            fh,
        )
    tok = tokenizer if callable(tokenizer) else make_tokenizer(tokenizer)
    docs_parts = os.path.join(out_dir, "docs_parts")
    postings_parts = os.path.join(out_dir, "postings_parts")

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        if "doc_id" not in batch.columns:
            raise ValueError("streaming corpus rows must carry doc_id")
        batch = batch.persist()
        try:
            docs_b = make_docs_df(batch, tok)
            (docs_b.repartitionByRange(max(2, n_partitions // 4), "docid")
                   .write.mode("overwrite")
                   .parquet(os.path.join(docs_parts, f"epoch={epoch_id}")))
            encoded = make_encoded_df(
                batch, 0, tok, log2_quantum, block_bits,
                positions=positions, emit_doclens=True,
            )
            (encoded.repartitionByRange(max(2, n_partitions // 4), "term", "block_id")
                    .write.mode("overwrite")
                    .parquet(os.path.join(postings_parts, f"epoch={epoch_id}")))
        finally:
            batch.unpersist()

    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    _compact(spark, paths, docs_parts, postings_parts,
             block_bits, log2_quantum, n_partitions, positions)
    finalize_index(
        spark, paths,
        log2_quantum=log2_quantum, positions=positions, block_bits=block_bits,
        n_partitions=n_partitions, resume=False, k1=k1, b=b,
    )
    return EFIndex(spark, out_dir)


def _compact(
    spark: SparkSession,
    paths: IndexPaths,
    docs_parts: str,
    postings_parts: str,
    block_bits: int,
    log2_quantum: int,
    n_partitions: int,
    positions: bool,
) -> None:
    """Canonicalize parts: rewrite docs sorted by docid; merge posting
    blocks that straddle micro-batch boundaries so the final postings
    are byte-identical to a batch rebuild. Entirely row-local — the
    per-posting doclens ride the parts rows, no broadcast."""
    docs = spark.read.option("recursiveFileLookup", "true").parquet(docs_parts)
    (docs.repartitionByRange(n_partitions, "docid")
         .sortWithinPartitions("docid")
         .write.mode("overwrite").parquet(paths.docs))

    q = 1 << log2_quantum
    ub = 1 << block_bits

    def merge_blocks(key, grp):
        if len(grp) == 1:
            return grp.drop(columns=["doclens"])
        # straddled block: decode every part, concat, re-encode — the
        # result is identical to encoding the full block at once
        term, block_id = key[0], int(key[1])
        base = block_id << block_bits
        d_all, f_all, dl_all, p_all = [], [], [], []
        for r in grp.itertuples(index=False):
            d_all.append(ef.decode_docids(bytes(r.docids_ef), int(r.df), ub, log2_quantum))
            tfs_part = ef.decode_freqs(bytes(r.freqs_ef), int(r.df), int(r.cf), log2_quantum)
            f_all.append(tfs_part)
            dl_all.append(np.asarray(r.doclens, dtype=np.int64))
            if positions:
                p_all.extend(
                    ef.decode_positions(
                        bytes(r.positions_ef), tfs_part, int(r.df),
                        int(r.sum_max_pos), log2_quantum,
                    )
                )
        d = np.concatenate(d_all)
        f = np.concatenate(f_all)
        dl = np.concatenate(dl_all)
        order = np.argsort(d)
        d, f, dl = d[order], f[order], dl[order]
        if np.any(np.diff(d) == 0):
            raise ValueError(f"duplicate docid across batches for term {term!r}")
        df_, cf = len(d), int(f.sum())
        tfs = f
        if positions:
            plists = [p_all[i] for i in order]
            smp = int(sum(int(p[-1]) for p in plists))
            pos_ef = ef.encode_positions(plists, df_, smp, log2_quantum)
        else:
            pos_ef, smp = None, 0
        n_q = (df_ + q - 1) // q
        q_last = (d + base)[np.minimum(np.arange(1, n_q + 1) * q - 1, df_ - 1)]
        pad_tf = np.zeros(n_q * q, dtype=np.int64)
        pad_tf[:df_] = tfs
        pad_dl = np.full(n_q * q, np.iinfo(np.int64).max, dtype=np.int64)
        pad_dl[:df_] = dl
        return pd.DataFrame(
            [
                {
                    "term": term,
                    "block_id": block_id,
                    "df": df_,
                    "cf": cf,
                    "maxtf": int(tfs.max()),
                    "first_docid": int(d[0] + base),
                    "last_docid": int(d[-1] + base),
                    "docids_ef": ef.encode_docids(d, ub, log2_quantum),
                    "freqs_ef": ef.encode_freqs(tfs, cf, log2_quantum),
                    "positions_ef": pos_ef,
                    "sum_max_pos": smp,
                    "q_last_docid": q_last.tolist(),
                    "q_max_tf": pad_tf.reshape(n_q, q).max(axis=1).tolist(),
                    "q_min_dl": pad_dl.reshape(n_q, q).min(axis=1).tolist(),
                }
            ]
        )

    parts = spark.read.option("recursiveFileLookup", "true").parquet(postings_parts)
    merged = parts.groupBy("term", "block_id").applyInPandas(
        merge_blocks, schema=POSTINGS_SCHEMA
    ).persist()  # merge once; repartitionByRange sampling reads the cache
    (merged.repartitionByRange(n_partitions, "term", "block_id")
           .sortWithinPartitions("term", "block_id")
           .write.mode("overwrite").parquet(paths.postings))
    merged.unpersist()
