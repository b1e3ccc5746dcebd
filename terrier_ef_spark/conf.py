"""Session-config hygiene helpers.

Jobs that need a non-default Spark SQL conf (e.g. large Arrow batches
for the encode shuffle) must not leak it into the shared SparkSession —
a query call silently changing Arrow batching for every other workload
on the session is a misuse hazard. `scoped_conf` saves and restores the
previous values around the job.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

# Large Arrow batches are load-bearing for the encode/score shuffles: at
# the default 4096 the applyInPandas transfer of posting rows is ~3x
# slower (measured: 49s -> 15s for 16.9M rows at local[32]).
ARROW_BATCH = "262144"


@contextmanager
def scoped_conf(spark: SparkSession, **kv: str):
    """Temporarily set spark.conf entries (dots written as __)."""
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    prev: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def arrow_batch_conf(spark: SparkSession):
    return scoped_conf(
        spark, spark__sql__execution__arrow__maxRecordsPerBatch=ARROW_BATCH
    )
