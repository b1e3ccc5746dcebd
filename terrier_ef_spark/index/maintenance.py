"""Index maintenance: tombstone deletes + block-selective compaction.

The reference index is immutable once generated (Generator.java writes
a final inverted file; document removal means a rebuild). A serving
engine at 100 TB needs the Lucene-style lifecycle instead: mark
documents deleted now (cheap, metadata-only), keep answering queries
correctly against the live set, and fold the tombstones into the index
bytes later, during off-peak compaction.

Design:

- **Tombstones** are a `deletes/` parquet of docids inside the index
  dir — O(deleted) bytes, no posting touched. Collection statistics
  (num_docs, avgdl, df/cf) stay GLOBAL until compaction, exactly like
  Lucene's deleted docs still counting toward IDF until a merge; the
  query twin encodes the same semantics.

- **Query-time filtering** is a left-anti join of the tombstones onto
  the decoded posting rows of the exhaustive term-major scorer (the
  same shape as the doc_filter candidate restriction, and like it any
  size of tombstone relation works — Catalyst picks broadcast vs
  sort-merge). BMW/MaxScore refuse tombstoned indexes: their seed
  theta would otherwise be computed over docs that can no longer be
  returned, and a too-high theta over-prunes (a *wrong*-results
  failure, not a slow one). Compact first, then prune-accelerate.

- **Compaction** rewrites ONLY the (term, block) blobs whose
  docid-range block contains a deleted docid. Blocked blobs encode
  docids relative to the block base with an upper bound that depends
  on block_bits alone (builder.block_upper_bound), so every blob in an
  untouched block is byte-reused verbatim — the same zero-recode
  property the segment merge (index/merge.py) exploits. With B
  uniformly-spread deletions over 2^block_bits-wide blocks, a
  compaction decodes O(B) blocks regardless of index size; the rest is
  two parquet scans, a union, and the standard finalize. Docids are
  NOT renumbered (gaps are free: doclen lookups are joins, blocked
  blobs don't care), so compaction composes with merge and incremental
  appends without relabeling anything.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import (
    FORMAT_VERSION,
    IndexPaths,
    block_upper_bound,
    encode_rows,
    finalize_index,
)
from terrier_ef_spark.index.reader import EFIndex


def deletes_path(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "deletes")


def deleted_docids(index: EFIndex) -> DataFrame | None:
    """Tombstoned docids as a (docid) DataFrame, or None if the index
    has no tombstones."""
    return index.deleted_docids()


def delete_docs(
    index: EFIndex,
    docids: list[int] | DataFrame,
) -> int:
    """Tombstone documents by docid. Metadata-only: no posting or doc
    row is touched; queries on this index exclude the docids at once
    (run_queries respect_deletes). Unknown docids are an error — a
    silent no-op delete would mask caller bugs. Idempotent: re-deleting
    an already-tombstoned docid is fine. Returns the total tombstone
    count after the write."""
    spark = index.spark
    if isinstance(docids, DataFrame):
        ids = docids.select(F.col("docid").cast("long")).distinct()
    else:
        if not docids:
            raise ValueError("delete_docs: empty docid list")
        ids = spark.createDataFrame(
            [(int(d),) for d in sorted(set(docids))], "docid long"
        )
    missing = ids.join(index.docs.select("docid"), "docid", "left_anti")
    missing_rows = [r["docid"] for r in missing.limit(5).collect()]
    if missing_rows:
        raise ValueError(
            f"delete_docs: docids not in index (first few): {missing_rows}"
        )

    final = deletes_path(index.paths)
    aside = final + "_old"
    # crash recovery from a prior interrupted swap: if the live dir is
    # missing but the set-aside copy exists, restore it before reading
    # (deleted_docids applies the same fallback on the read side)
    if os.path.exists(aside) and not os.path.exists(
        os.path.join(final, "_SUCCESS")
    ):
        shutil.rmtree(final, ignore_errors=True)
        os.rename(aside, final)

    old = deleted_docids(index)
    merged = ids if old is None else old.unionByName(ids).distinct()
    # the new tombstone set may read the old one: write to a sidecar
    # dir, then swap (single-writer maintenance op, like Lucene commits).
    # Swap order is crash-safe: the old set is RENAMED ASIDE (not
    # deleted) before tmp moves into place, so a crash at any point
    # leaves either the old set live, or the old set detectably parked
    # at deletes_old — never a silently tombstone-free index.
    tmp = final + "_tmp"
    # range-partitioned on docid so a billion-row tombstone set still
    # writes (and later anti-joins) in parallel; tiny sets cost one file
    merged.repartitionByRange(8, "docid").write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, aside)
    os.rename(tmp, final)
    shutil.rmtree(aside, ignore_errors=True)
    return int(n)


def clear_deletes(index: EFIndex) -> None:
    shutil.rmtree(deletes_path(index.paths), ignore_errors=True)


def _decode_live_rows(
    touched: DataFrame,
    num_docs: int,
    block_bits: int,
    log2q: int,
    positions: bool,
) -> DataFrame:
    """Decode the touched (term, block) blobs to posting rows —
    (term, docid, tf[, positions]) — for re-encoding. Same vectorized
    whole-blob decode as engine.decode_postings, plus the positions
    payload when the index is positional (a compacted positional index
    keeps phrase search exact)."""

    def decode(batches):
        for pdf in batches:
            recs: dict[str, list] = {"term": [], "docid": [], "tf": []}
            if positions:
                recs["positions"] = []
            for r in pdf.itertuples(index=False):
                df_b, cf_b = int(r.df), int(r.cf)
                base = int(r.block_id) << block_bits
                ub = block_upper_bound(block_bits, num_docs)
                d = ef.decode_docids(bytes(r.docids_ef), df_b, ub, log2q) + base
                tfs = ef.decode_freqs(bytes(r.freqs_ef), df_b, cf_b, log2q)
                recs["term"].append(np.repeat(r.term, df_b))
                recs["docid"].append(d)
                recs["tf"].append(tfs)
                if positions:
                    plists = ef.decode_positions(
                        bytes(r.positions_ef), tfs, df_b,
                        int(r.sum_max_pos), log2q,
                    )
                    recs["positions"].extend(
                        [p.astype(np.int64).tolist() for p in plists]
                    )
            if recs["term"]:
                out = {
                    "term": np.concatenate(recs["term"]),
                    "docid": np.concatenate(recs["docid"]),
                    "tf": np.concatenate(recs["tf"]).astype(np.int32),
                }
                if positions:
                    out["positions"] = recs["positions"]
                yield pd.DataFrame(out)

    cols = ["term", "block_id", "df", "cf", "docids_ef", "freqs_ef"]
    schema = "term string, docid long, tf int"
    if positions:
        cols += ["positions_ef", "sum_max_pos"]
        schema += ", positions array<long>"
    return touched.select(cols).mapInPandas(decode, schema=schema)


def compact_index(
    index: EFIndex,
    out_dir: str,
    *,
    n_partitions: int = 32,
) -> EFIndex:
    """Write a compacted copy of `index` at out_dir with every
    tombstoned document physically removed. Only blobs in blocks that
    contain a deleted docid are decoded and re-encoded; all other blob
    bytes are reused verbatim (asserted byte-identical in tests).
    Collection statistics (num_docs, avgdl, per-term df/cf) are
    recomputed over the live set by the standard finalize — post-
    compact BM25 scores reflect the live collection, as after a Lucene
    merge. The source index is left untouched (tombstones included)."""
    tomb = deleted_docids(index)
    if tomb is None:
        raise ValueError("compact_index: index has no tombstones")
    if os.path.abspath(out_dir) == os.path.abspath(index.paths.root):
        raise ValueError("compact_index: out_dir must differ from the index dir")
    block_bits = index.stats.get("block_bits")
    if block_bits is None:
        raise ValueError(
            "compact requires a blocked index (block_bits set): unblocked "
            "blobs encode absolute docids bounded by num_docs, so no blob "
            "is reusable after the doc count changes — rebuild with "
            "block_bits (always set at scale anyway)"
        )
    spark = index.spark
    po = IndexPaths(out_dir)
    log2q = int(index.stats["log2_quantum"])
    positions = bool(index.stats.get("has_positions"))
    num_docs = int(index.stats["num_docs"])
    t0 = time.time()

    tomb = tomb.select(F.col("docid").cast("long")).persist()
    n_deleted = tomb.count()
    # the touched-block set is O(deleted) rows — always broadcast-small
    # relative to the postings scan it prunes
    del_blocks = (
        tomb.select(F.shiftright("docid", block_bits).alias("block_id"))
        .distinct()
    )

    posts = index.postings
    untouched = posts.join(F.broadcast(del_blocks), "block_id", "left_anti")
    touched = posts.join(F.broadcast(del_blocks), "block_id", "left_semi")
    n_touched_blobs = touched.count()

    live = (
        _decode_live_rows(touched, num_docs, block_bits, log2q, positions)
        .join(tomb, "docid", "left_anti")
        .join(index.docs.select("docid", "doclen"), "docid")
    )
    recoded = encode_rows(live, num_docs, log2q, block_bits, positions)

    os.makedirs(out_dir, exist_ok=True)
    with open(index.paths.params) as fh:
        params = json.load(fh)
    if params.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"cannot compact format {params.get('format')} "
            f"(expected {FORMAT_VERSION})"
        )
    with open(po.params, "w") as fh:
        json.dump({**params, "compacted_from": index.paths.root,
                   "n_partitions": n_partitions}, fh)

    (untouched.unionByName(recoded.select(*untouched.columns))
              .repartitionByRange(n_partitions, "term", "block_id")
              .sortWithinPartitions("term", "block_id")
              .write.mode("overwrite").parquet(po.postings))

    (index.docs.join(tomb, "docid", "left_anti")
               .repartitionByRange(n_partitions, "docid")
               .sortWithinPartitions("docid")
               .write.mode("overwrite").parquet(po.docs))
    tomb.unpersist()

    stage_sec = {"compact": time.time() - t0}
    finalize_index(
        spark, po,
        log2_quantum=log2q, positions=positions,
        block_bits=block_bits, n_partitions=n_partitions,
        resume=False, stage_sec=stage_sec,
        # tuned scoring defaults survive compaction (round-4 verdict bug)
        k1=float(index.stats.get("k1", 1.2)),
        b=float(index.stats.get("b", 0.75)),
    )
    with open(po.manifest, "w") as fh:
        json.dump(
            {"op": "compact", "source": index.paths.root,
             "n_deleted": int(n_deleted),
             "blobs_recoded": int(n_touched_blobs),
             "stage_sec": stage_sec},
            fh,
        )
    return EFIndex(spark, out_dir)
