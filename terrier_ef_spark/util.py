"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize `result` once (localCheckpoint) and then unpersist the
    big cached intermediates it was derived from.

    Operators that persist an intermediate (e.g. MinHash signatures
    before an LSH self-join) must not leak those cached blocks for the
    session lifetime. localCheckpoint(eager=True) runs the job now and
    pins only the RESULT partitions (bounded by output size, spillable
    to disk); the intermediates are released immediately, and the result
    blocks are cleaned by Spark's ContextCleaner when the returned
    DataFrame is garbage-collected. At full production scale, prefer the
    write-to-sink variant of the calling operator so nothing is pinned.
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
