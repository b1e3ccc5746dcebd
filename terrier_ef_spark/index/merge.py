"""Merge two finalized EF indexes into one (the Lucene-segment-merge
role; the reference's ordered binary merge, Generator.java:249-268,
rebases bit offsets the same way — here whole blobs are rebased by
docid relabeling instead of bit-shifting a global bitfile).

Key design point: posting blobs encode docids RELATIVE to their block
base (block_id << block_bits), so offsetting the second index by a
MULTIPLE OF THE BLOCK WIDTH makes the merge a pure metadata relabel —
block_id, first/last_docid and the q_last_docid skip grid shift by the
offset while every EF blob byte stays untouched. At 100 TB this means
a merge never decodes or re-encodes a single posting: it is two
parquet scans, a union, and one range-partitioned write, plus the
standard lexicon/stats finalize over the union. (Merging indexes whose
docid spaces already interleave is the streaming incremental build's
straddled-block path, streaming/incremental.py:160-229.)

The offset leaves a docid gap smaller than one block width between the
two corpora; doclen lookups are joins against the docs table, so gaps
cost nothing (the query-major kernel's dense doclen array grows by
< 2^block_bits entries, within its documented <=1e8-doc envelope).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from terrier_ef_spark.index.builder import (
    FORMAT_VERSION,
    IndexPaths,
    finalize_index,
)
from terrier_ef_spark.index.reader import EFIndex

_MUST_MATCH = ("format", "log2_quantum", "positions", "block_bits", "tokenizer")


def merge_indexes(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 32,
) -> EFIndex:
    """Merge index `a` and index `b` (both `build_index` outputs with
    identical encoding params) into a new index at out_dir. Docids of
    `b` are shifted up by the smallest block-aligned offset past `a`'s
    docid space; blob bytes are reused verbatim."""
    pa, pb, po = IndexPaths(a_dir), IndexPaths(b_dir), IndexPaths(out_dir)
    with open(pa.params) as fh:
        params_a = json.load(fh)
    with open(pb.params) as fh:
        params_b = json.load(fh)
    for key in _MUST_MATCH:
        if params_a.get(key) != params_b.get(key):
            raise ValueError(
                f"cannot merge: params mismatch on {key!r}: "
                f"{params_a.get(key)!r} != {params_b.get(key)!r}"
            )
    if params_a.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"cannot merge format {params_a.get('format')} indexes "
            f"(expected {FORMAT_VERSION})"
        )
    if params_a.get("block_bits") is None:
        raise ValueError(
            "merge requires blocked indexes (block_bits set): unblocked "
            "blobs encode absolute docids with a num_docs upper bound, "
            "so relabeling cannot reuse their bytes — rebuild with "
            "block_bits (always set at scale anyway)"
        )
    block_bits = int(params_a["block_bits"])
    log2_quantum = int(params_a["log2_quantum"])
    positions = bool(params_a["positions"])

    docs_a = spark.read.parquet(pa.docs)
    docs_b = spark.read.parquet(pb.docs)
    max_a = docs_a.agg(F.max("docid")).collect()[0][0]
    if max_a is None:
        raise ValueError("index a has no documents")
    offset = ((int(max_a) >> block_bits) + 1) << block_bits
    block_offset = offset >> block_bits

    os.makedirs(out_dir, exist_ok=True)
    with open(po.params, "w") as fh:
        json.dump({**params_a, "merged_from": [a_dir, b_dir],
                   "merge_offset": offset, "n_partitions": n_partitions}, fh)

    docs = docs_a.unionByName(
        docs_b.withColumn("docid", F.col("docid") + offset)
    )
    (docs.repartitionByRange(n_partitions, "docid")
         .sortWithinPartitions("docid")
         .write.mode("overwrite").parquet(po.docs))

    post_a = spark.read.parquet(pa.postings)
    post_b = spark.read.parquet(pb.postings)
    shifted_b = (
        post_b.withColumn("block_id", F.col("block_id") + block_offset)
        .withColumn("first_docid", F.col("first_docid") + offset)
        .withColumn("last_docid", F.col("last_docid") + offset)
        .withColumn(
            "q_last_docid",
            F.transform("q_last_docid", lambda x: x + offset),
        )
    )
    # block-aligned offset => no (term, block_id) collision is possible;
    # blobs ride through untouched (byte-identity asserted in tests)
    (post_a.unionByName(shifted_b)
           .repartitionByRange(n_partitions, "term", "block_id")
           .sortWithinPartitions("term", "block_id")
           .write.mode("overwrite").parquet(po.postings))

    finalize_index(
        spark, po,
        log2_quantum=log2_quantum, positions=positions,
        block_bits=block_bits, n_partitions=n_partitions, resume=False,
    )
    with open(po.manifest, "w") as fh:
        json.dump({"op": "merge", "sources": [a_dir, b_dir],
                   "offset": offset}, fh)
    return EFIndex(spark, out_dir)
