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


def merge_many(
    spark: SparkSession,
    dirs: list[str],
    out_dir: str,
    *,
    n_partitions: int = 32,
) -> EFIndex:
    """N-way zero-recode merge: union ALL segments in one pass with
    cumulative block-aligned docid offsets. This is the log-structured
    build's compaction step — and doing it N-way matters at scale: a
    chain of pairwise merges rewrites the accumulated big segment N-1
    times (O(N·total) write amplification), while one N-way union
    writes every blob byte exactly once (O(total)). Offsets compose the
    pairwise rule: each segment starts at the first block boundary past
    the previous segment's docid space, so no (term, block_id) can
    collide and every blob rides through untouched."""
    if len(dirs) < 2:
        raise ValueError("merge_many needs at least two indexes")
    paths = [IndexPaths(d) for d in dirs]
    po = IndexPaths(out_dir)
    params = []
    for p in paths:
        with open(p.params) as fh:
            params.append(json.load(fh))
    for i, prm in enumerate(params[1:], start=1):
        for key in _MUST_MATCH:
            if params[0].get(key) != prm.get(key):
                raise ValueError(
                    f"cannot merge: params mismatch on {key!r}: "
                    f"{params[0].get(key)!r} != {prm.get(key)!r} "
                    f"({dirs[0]} vs {dirs[i]})"
                )
    if params[0].get("format") != FORMAT_VERSION:
        raise ValueError(
            f"cannot merge format {params[0].get('format')} indexes "
            f"(expected {FORMAT_VERSION})"
        )
    if params[0].get("block_bits") is None:
        raise ValueError(
            "merge requires blocked indexes (block_bits set): unblocked "
            "blobs encode absolute docids with a num_docs upper bound, "
            "so relabeling cannot reuse their bytes — rebuild with "
            "block_bits (always set at scale anyway)"
        )
    block_bits = int(params[0]["block_bits"])
    log2_quantum = int(params[0]["log2_quantum"])
    positions = bool(params[0]["positions"])

    # scoring params live in stats.json (finalize writes them): segments
    # tuned differently must not merge silently — the merged index has
    # ONE default ranking, so k1/b are as must-match as the encoding
    # params above (round-4 verdict: lifecycle verbs were resetting them)
    seg_stats = []
    for p in paths:
        with open(p.stats) as fh:
            seg_stats.append(json.load(fh))
    k1 = float(seg_stats[0].get("k1", 1.2))
    b = float(seg_stats[0].get("b", 0.75))
    for i, st in enumerate(seg_stats[1:], start=1):
        if (float(st.get("k1", 1.2)), float(st.get("b", 0.75))) != (k1, b):
            raise ValueError(
                f"cannot merge: BM25 params mismatch: k1/b "
                f"{k1}/{b} != {st.get('k1', 1.2)}/{st.get('b', 0.75)} "
                f"({dirs[0]} vs {dirs[i]}) — rebuild or re-finalize one "
                "side with matching params"
            )

    # per-segment max docid: one tiny agg per segment (segment counts
    # are tens-to-hundreds; the docs scans are metadata-cheap and the
    # offsets must be known before the single union job is planned)
    offsets: list[int] = []
    running = 0
    docs_parts = []
    post_parts = []
    tomb_parts = []
    for d, p in zip(dirs, paths):
        docs_d = spark.read.parquet(p.docs)
        max_d = docs_d.agg(F.max("docid")).collect()[0][0]
        if max_d is None:
            raise ValueError(f"index {d} has no documents")
        offset = running
        offsets.append(offset)
        running = offset + ((((int(max_d)) >> block_bits) + 1) << block_bits)
        block_offset = offset >> block_bits
        docs_parts.append(
            docs_d if offset == 0
            else docs_d.withColumn("docid", F.col("docid") + offset)
        )
        post_d = spark.read.parquet(p.postings)
        post_parts.append(
            post_d if offset == 0
            else post_d.withColumn("block_id", F.col("block_id") + block_offset)
            .withColumn("first_docid", F.col("first_docid") + offset)
            .withColumn("last_docid", F.col("last_docid") + offset)
            .withColumn(
                "q_last_docid",
                F.transform("q_last_docid", lambda x: x + offset),
            )
        )
        # tombstones ride through relabeled, like every other docid
        # artifact: a deleted doc must stay deleted after a merge (and
        # after tiering.compact_segments, which is merge_many underneath).
        # Mirror EFIndex.deleted_docids()'s crash-fallback: a crash
        # mid-swap in delete_docs leaves the live set parked at
        # deletes_old — reading only deletes/ would resurrect those docs
        # in the merged index (round-4 ADVICE finding).
        tomb_src = os.path.join(p.root, "deletes")
        if not os.path.exists(os.path.join(tomb_src, "_SUCCESS")):
            aside = tomb_src + "_old"
            tomb_src = (
                aside if os.path.exists(os.path.join(aside, "_SUCCESS"))
                else None
            )
        if tomb_src is not None:
            t_d = spark.read.parquet(tomb_src)
            tomb_parts.append(
                t_d if offset == 0
                else t_d.withColumn("docid", F.col("docid") + offset)
            )

    os.makedirs(out_dir, exist_ok=True)
    with open(po.params, "w") as fh:
        json.dump({**params[0], "merged_from": list(dirs),
                   "merge_offsets": offsets, "n_partitions": n_partitions}, fh)

    docs = docs_parts[0]
    for part in docs_parts[1:]:
        docs = docs.unionByName(part)
    (docs.repartitionByRange(n_partitions, "docid")
         .sortWithinPartitions("docid")
         .write.mode("overwrite").parquet(po.docs))

    # block-aligned offsets => no (term, block_id) collision is possible;
    # blobs ride through untouched (byte-identity asserted in tests)
    posts = post_parts[0]
    for part in post_parts[1:]:
        posts = posts.unionByName(part)
    (posts.repartitionByRange(n_partitions, "term", "block_id")
          .sortWithinPartitions("term", "block_id")
          .write.mode("overwrite").parquet(po.postings))

    if tomb_parts:
        tomb = tomb_parts[0]
        for part in tomb_parts[1:]:
            tomb = tomb.unionByName(part)
        (tomb.repartitionByRange(8, "docid")
             .write.mode("overwrite")
             .parquet(os.path.join(po.root, "deletes")))

    finalize_index(
        spark, po,
        log2_quantum=log2_quantum, positions=positions,
        block_bits=block_bits, n_partitions=n_partitions, resume=False,
        k1=k1, b=b,
    )
    with open(po.manifest, "w") as fh:
        json.dump({"op": "merge", "sources": list(dirs),
                   "offsets": offsets,
                   "tombstoned_sources": len(tomb_parts)}, fh)
    return EFIndex(spark, out_dir)


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
    docid space; blob bytes are reused verbatim. (The two-segment case
    of merge_many.)"""
    return merge_many(spark, [a_dir, b_dir], out_dir,
                      n_partitions=n_partitions)
