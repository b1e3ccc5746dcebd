"""Streaming exact dedup — a custom STATEFUL Structured Streaming
operator (`applyInPandasWithState`): only the FIRST arrival of each
distinct content hash is emitted, across micro-batches and restarts.

The reference engine is strictly batch (SURVEY.md §2.4); batch-side
exact dedup lives in `pipeline/dedup.py`. This is the streaming
counterpart a continuously-fed training-data pipeline needs: docs
land as files, and duplicates of anything ever seen before are
suppressed at ingest time instead of by periodic full-corpus passes.

100-TB shape:
- State is sharded by a CONTENT-HASH PREFIX group key (`n_shards`
  groups hash-partitioned across the state store), so no shard is a
  hot key and no executor holds more than its slice. Nothing touches
  the driver.
- Each distinct document costs one 16-byte md5 digest in the state
  store; shard values are packed binary blobs (np bytes, not per-row
  objects). 10^10 distinct docs ≈ 160 GB of state cluster-wide —
  use the RocksDB state-store provider
  (`spark.sql.streaming.stateStore.providerClass`) at that scale; the
  default in-memory provider is fine for tests and small feeds.
- For bounded-state deployments (dedup within a retention horizon),
  `GroupStateTimeout.ProcessingTimeTimeout` + `state.remove()` is the
  idiom; this operator keeps state forever by default because exact
  dedup's contract is "ever seen".

Exactly-once: the checkpoint makes file ingestion + state updates
atomic per micro-batch; re-running after new files land continues
from the checkpoint (tested across two separate runs).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, StructField, StructType

from terrier_ef_spark.streaming.incremental import CORPUS_SCHEMA

OUT_SCHEMA = CORPUS_SCHEMA + ", content_hash string"
_STATE_SCHEMA = StructType([StructField("digests", BinaryType())])


def dedup_first_arrivals(docs: DataFrame, n_shards: int = 1024) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame holding only the
    first arrival of each distinct content. Group key = md5 prefix
    (n_shards buckets); per-group state = packed 16-byte digests."""
    hashed = docs.withColumn("content_hash", F.md5(F.col("content")))
    shards = hashed.withColumn(
        "shard", F.conv(F.substring("content_hash", 1, 4), 16, 10).cast("int")
        % F.lit(n_shards)
    )
    out_cols = [f.strip().split(" ")[0] for f in OUT_SCHEMA.split(",")]

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            (blob,) = state.get
            seen = {bytes(blob[i : i + 16]) for i in range(0, len(blob), 16)}
            packed = bytes(blob)
        else:
            seen, packed = set(), b""
        fresh: list[bytes] = []
        for pdf in pdf_iter:
            # intra-chunk first-wins, then filter against state
            pdf = pdf.drop_duplicates(subset=["content_hash"], keep="first")
            digests = pdf["content_hash"].map(bytes.fromhex)
            mask = [d not in seen for d in digests]
            kept = pdf.loc[mask]
            for d in digests[mask]:
                seen.add(d)
                fresh.append(d)
            if len(kept):
                yield kept[out_cols]
        if fresh:
            state.update((packed + b"".join(fresh),))

    return shards.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    n_shards: int = 1024,
    max_files_per_trigger: int | None = None,
) -> None:
    """Consume all corpus parquet currently in input_dir
    (Trigger.AvailableNow) and append first-arrival rows to
    out_dir/survivors. Re-running after new files land continues from
    the checkpoint: docs duplicating ANY earlier run's content are
    suppressed by the persisted state."""
    os.makedirs(out_dir, exist_ok=True)
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    deduped = dedup_first_arrivals(docs, n_shards=n_shards)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "survivors"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
