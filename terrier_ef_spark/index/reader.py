"""Index artifact loader — the role of IndexOnDisk.createIndex +
EFInvertedIndex mmap (EFInvertedIndex.java:64-86), on Parquet: blobs are
read as contiguous bytes and viewed zero-copy with np.frombuffer inside
the decode kernels; term-range-sorted parquet gives row-group pruning
for term lookups (the lexicon binary-search role, Generator.java:286-296).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from terrier_ef_spark import ef
from terrier_ef_spark.index.builder import IndexPaths


class EFIndex:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.paths = IndexPaths(root)
        with open(self.paths.stats) as fh:
            self.stats = json.load(fh)
        fmt = self.stats.get("format", 0)
        from terrier_ef_spark.index.builder import FORMAT_VERSION

        if fmt != FORMAT_VERSION:
            raise ValueError(
                f"index at {root} has format {fmt}, reader expects "
                f"{FORMAT_VERSION}; rebuild the index (a pre-change blocked "
                "index would otherwise mis-decode silently)"
            )

    # DataFrame views -------------------------------------------------
    @property
    def postings(self) -> DataFrame:
        if getattr(self, "_postings_cached", None) is not None:
            return self._postings_cached
        return self.spark.read.parquet(self.paths.postings)

    @property
    def lexicon(self) -> DataFrame:
        if getattr(self, "_lexicon_cached", None) is not None:
            return self._lexicon_cached
        return self.spark.read.parquet(self.paths.lexicon)

    @property
    def docs(self) -> DataFrame:
        if getattr(self, "_docs_cached", None) is not None:
            return self._docs_cached
        return self.spark.read.parquet(self.paths.docs)

    def enable_serving_cache(self) -> None:
        """Pin the postings / lexicon / docs relations in Spark's
        in-memory columnar cache for a READ-ONLY serving session
        (submit_query --server). Single-topic latency is otherwise
        dominated by parquet job overhead — footer reads and task
        scheduling across the term-range files (~0.3 s per scan at
        sf0.1) — not by decode; the cached relations keep term-pruned
        scans in memory executor-side. Distributed (executor block
        manager, spills to disk at scale), NOT a driver collect.
        Do not combine with lifecycle verbs that rewrite the index
        in place (delete_docs/compact); reopen the index after those."""
        from pyspark import StorageLevel

        for attr, path in (
            ("_postings_cached", self.paths.postings),
            ("_lexicon_cached", self.paths.lexicon),
            ("_docs_cached", self.paths.docs),
        ):
            df = self.spark.read.parquet(path).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            df.count()  # materialize now, not on the first topic
            setattr(self, attr, df)

    @property
    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.metrics)

    def deleted_docids(self) -> DataFrame | None:
        """Tombstoned docids (index/maintenance.py delete_docs), or None
        if the index carries no tombstones. Queries exclude these by
        default (run_queries respect_deletes)."""
        p = os.path.join(self.paths.root, "deletes")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            # a crash mid-swap in delete_docs leaves the previous set
            # parked at deletes_old; read it rather than silently
            # resurrecting deleted docs (next delete_docs restores it)
            aside = p + "_old"
            if os.path.exists(os.path.join(aside, "_SUCCESS")):
                return self.spark.read.parquet(aside)
            return None
        return self.spark.read.parquet(p)

    # decode helpers (used by kernels and tests) ----------------------
    def decode_block_docids(self, row) -> np.ndarray:
        """Decode one postings row's docid blob to absolute docids."""
        from terrier_ef_spark.index.builder import block_upper_bound, decode_bound

        bb = self.stats.get("block_bits")
        n_docs = decode_bound(self.stats)
        q = self.stats["log2_quantum"]
        ub = block_upper_bound(bb, n_docs)
        base = 0 if bb is None else int(row["block_id"]) << bb
        return ef.decode_docids(bytes(row["docids_ef"]), row["df"], ub, q) + base

    def decode_block_freqs(self, row) -> np.ndarray:
        return ef.decode_freqs(
            bytes(row["freqs_ef"]), row["df"], row["cf"], self.stats["log2_quantum"]
        )

    def decode_block_positions(self, row) -> list[np.ndarray]:
        tfs = self.decode_block_freqs(row)
        return ef.decode_positions(
            bytes(row["positions_ef"]), tfs, int(row["df"]),
            int(row["sum_max_pos"]), self.stats["log2_quantum"],
        )

    def doclen_array(self) -> np.ndarray:
        """Dense doclen array indexed by docid (role of the reference's
        in-RAM int[] doc-length index, EFDocumentIndex.java:43-47).
        Broadcast to scoring kernels; viable to ~1e8 docs — beyond that
        the partitioned doclen join path in query/engine.py applies.
        Cached on the instance: the docs artifact is immutable for the
        life of an index dir (compaction/merge produce NEW dirs, and
        tombstones never touch doclens)."""
        if getattr(self, "_doclen_arr", None) is not None:
            return self._doclen_arr
        pdf = self.docs.select("docid", "doclen").toPandas()
        ids = pdf["docid"].to_numpy()
        # size by max docid: merged indexes leave a < block-width docid
        # gap between source corpora (index/merge.py), so the id space
        # can exceed num_docs; gap entries stay 0 (never referenced)
        size = int(ids.max()) + 1 if len(ids) else 0
        arr = np.zeros(max(size, self.stats["num_docs"]), dtype=np.int32)
        arr[ids] = pdf["doclen"].to_numpy()
        self._doclen_arr = arr
        return arr

    def doclen_broadcast(self):
        """The doclen array as a cached SparkContext broadcast — one
        torrent distribution per index lifetime instead of one per
        query call (the dominant per-call fixed cost on small batches)."""
        if getattr(self, "_doclen_bc", None) is not None:
            return self._doclen_bc
        self._doclen_bc = self.spark.sparkContext.broadcast(
            self.doclen_array()
        )
        return self._doclen_bc


def open_index(spark: SparkSession, root: str) -> EFIndex:
    if not os.path.exists(IndexPaths(root).stats):
        raise FileNotFoundError(f"no index at {root}")
    return EFIndex(spark, root)
