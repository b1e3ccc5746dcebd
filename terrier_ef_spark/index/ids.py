"""Deterministic dense-id assignment, partition-layout independent.

Replaces the reference's 'aligned termids' discipline (termid == record
ordinal in sorted lexicon order, Generator.java:283) with a scalable
two-phase pattern: range-partition by the sort key, count per partition,
broadcast cumulative offsets, then per-partition arange — never a global
single-partition window and never monotonically_increasing_id (which is
partition-layout dependent; SURVEY.md §7 risk 5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    n_partitions: int = 32,
    release_to: list[DataFrame] | None = None,
) -> DataFrame:
    """Add `id_col` = 0..n-1 dense rank of the row in global
    lexicographic `order_cols` order. `n_partitions` must be fixed by
    the caller (not derived from cluster size) so results are identical
    at any parallelism.

    The range-partitioned input is persisted (it is consumed by both the
    per-partition count job and the final id map). Ownership of that
    cache: if `release_to` is given, the persisted intermediate is
    appended to it and the CALLER must unpersist after materializing the
    result (the builder does so right after each parquet write);
    otherwise it is released here via an eager localCheckpoint of the
    result (correct but pins the result blocks until GC)."""
    d = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.persist()
    if release_to is not None:
        release_to.append(d)
    counts = (
        d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    sizes = {int(r["_pid"]): int(r["cnt"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{id_col}` long"

    def add_ids(batches):
        counter = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if counter is None:
                counter = offsets[int(pdf["_pid"].iloc[0])]
            ids = range(counter, counter + len(pdf))
            counter += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[id_col] = pd.array(ids, dtype="int64")
            yield out

    result = d.mapInPandas(add_ids, schema=out_schema)
    if release_to is None:
        result = result.localCheckpoint(eager=True)
        d.unpersist()
    return result
