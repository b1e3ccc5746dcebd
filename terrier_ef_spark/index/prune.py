"""Static index pruning (Carmel et al., "Static Index Pruning for
Information Retrieval Systems", SIGIR 2001 — the top-k variant): keep
only each term's `top_n` highest-tf postings and re-encode. A pruned
index answers top-k queries at a fraction of the decode cost; it is
the classic serving-tier companion to a full archival index at scale.

Semantics kept deliberately simple and auditable:
- collection statistics (num_docs, doclens, avgdl) stay GLOBAL — the
  docs table is copied verbatim, so tf-normalization is unchanged;
- per-term df/cf are recomputed over the kept postings by the standard
  finalize (they describe what the index can match);
- positions are refused (a pruned index serves scoring, not phrase
  search; silently stale position segments would be worse than none).

Scale shape: decode -> per-term window top-n -> doclen join ->
re-encode is the exact build pipeline after the tokenize stage; every
step is the already-audited partitioned shuffle (no broadcast, no
driver state). The window and the encode groupBy share the `term` key.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.builder import (
    FORMAT_VERSION,
    IndexPaths,
    decode_bound,
    encode_rows,
    finalize_index,
)
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import decode_postings


def prune_index(
    index: EFIndex,
    out_dir: str,
    top_n: int,
    *,
    n_partitions: int = 32,
) -> EFIndex:
    """Write a statically pruned copy of `index` at out_dir keeping each
    term's `top_n` postings by (tf desc, docid asc)."""
    if index.stats.get("has_positions"):
        raise ValueError(
            "refusing to prune a positional index: pruned indexes serve "
            "top-k scoring only — rebuild without positions first"
        )
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    spark = index.spark
    po = IndexPaths(out_dir)
    log2_quantum = int(index.stats["log2_quantum"])
    block_bits = index.stats.get("block_bits")
    # ENCODE bound: the source's own encode bound, not its live count —
    # when tombstones fold below, finalize recounts num_docs over the
    # live set, but unblocked blobs here are encoded against this bound,
    # so it must be recorded (docid_bound) for every decode path.
    # Blocked blobs are bounded by the block width (block_upper_bound)
    # and never consult it.
    encode_ub = decode_bound(index.stats)
    t0 = time.time()

    # Tombstones fold in here (prune decodes everything anyway): deleted
    # postings are dropped BEFORE the top-n window so they can't occupy
    # kept slots, and the docs copy below filters to the live set, so
    # the pruned index is tombstone-free with live-set statistics —
    # prune(tombstoned idx) == prune(compact(idx)) w.r.t. what it serves.
    tomb = index.deleted_docids()
    rows = decode_postings(index).select("term", "docid", "tf")
    if tomb is not None:
        rows = rows.join(tomb.select("docid"), "docid", "left_anti")
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("docid"))
    kept = (
        rows.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .drop("rk")
    )
    # the encode kernel's BMW metadata (q_min_dl) needs doclen per row:
    # partitioned join against the docs table (no broadcast; same shape
    # as term-major scoring)
    kept = kept.join(index.docs.select("docid", "doclen"), "docid")

    os.makedirs(out_dir, exist_ok=True)
    with open(po.params, "w") as fh:
        json.dump(
            {
                "format": FORMAT_VERSION,
                "log2_quantum": log2_quantum,
                "positions": False,
                "block_bits": block_bits,
                "n_partitions": n_partitions,
                "tokenizer": "pruned",
                "stopwords": None,
                "max_term_length": None,
                "pruned_from": index.paths.root,
                "prune_top_n": top_n,
            },
            fh,
        )

    encoded = encode_rows(
        kept, encode_ub, log2_quantum, block_bits, positions=False
    ).persist()
    (encoded.repartitionByRange(n_partitions, "term", "block_id")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite").parquet(po.postings))
    encoded.unpersist()

    # docs table verbatim (doclens / avgdl / num_docs stay global) —
    # minus tombstoned docs, whose removal makes the stats the live-set
    # stats, exactly as after compaction
    docs_out = spark.read.parquet(index.paths.docs)
    if tomb is not None:
        docs_out = docs_out.join(tomb.select("docid"), "docid", "left_anti")
    (docs_out
          .repartitionByRange(n_partitions, "docid")
          .sortWithinPartitions("docid")
          .write.mode("overwrite").parquet(po.docs))

    stage_sec = {"prune_encode": time.time() - t0}
    # k1/b ride through from the source index — a lifecycle verb must
    # never silently reset tuned scoring defaults (round-4 verdict bug)
    stats = finalize_index(
        spark, po,
        log2_quantum=log2_quantum, positions=False,
        block_bits=block_bits, n_partitions=n_partitions,
        resume=False, stage_sec=stage_sec,
        k1=float(index.stats.get("k1", 1.2)),
        b=float(index.stats.get("b", 0.75)),
    )
    if block_bits is None and encode_ub != stats["num_docs"]:
        # tombstone folding shrank the live count after the blobs were
        # encoded against encode_ub: record the encode bound so decode
        # paths (builder.decode_bound) keep using it
        stats["docid_bound"] = encode_ub
        with open(po.stats, "w") as fh:
            json.dump(stats, fh, indent=2)
    with open(po.manifest, "w") as fh:
        json.dump(
            {"op": "prune", "source": index.paths.root,
             "top_n": top_n, "stage_sec": stage_sec,
             "tombstones_folded": tomb is not None},
            fh,
        )
    return EFIndex(spark, out_dir)
