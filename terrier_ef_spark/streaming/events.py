"""Streaming windowed aggregation with watermark-based late-data
handling over the events table shape (ts, event_type, value).

Demonstrates the Structured Streaming side of the engine (task brief:
'watermarks + windowed aggs for late data'): a file-source stream of
event parquet is aggregated into 5-minute tumbling windows; rows later
than the watermark relative to the max seen event time are dropped by
the engine; in append output mode a window is emitted exactly once,
when the watermark passes its end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def windowed_event_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """The streaming aggregation plan: tumbling-window counts + sums per
    event_type with a `watermark` lateness bound. Works on any streaming
    DataFrame with the events schema."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_events_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Consume all event parquet currently in input_dir
    (Trigger.AvailableNow) into an append-mode windowed-count parquet
    sink; returns the sink as a DataFrame. Re-running after new files
    land appends newly-finalized windows (checkpointed source +
    watermark state). Windows still open when the stream drains (i.e.
    not yet passed by the watermark) remain in state and are emitted on
    a later run — append mode emits each window exactly once."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    agg = windowed_event_counts(stream, window, watermark)
    query = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "windows"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization — the classic event-analytics operator
    (a new session starts when a user's inter-event gap exceeds
    `gap_minutes`): returns one row per (user_id, session) with
    session_start / session_end / n_events / sum_value, sessions
    numbered 1..n per user in time order.

    Relational shape: the gaps-and-islands pattern — one lag window to
    flag session starts, one running-sum window to number sessions,
    one aggregation; everything partitions on user_id, so the three
    steps ride ONE hash exchange (Catalyst reuses the partitioning
    across the two windows and the groupBy). No per-user skew beyond
    the user's own event count; for the streaming analogue use
    applyInPandasWithState or Spark's native session_window — this is
    the batch/backfill twin with an exact SQL oracle.

    Ties: events sharing a timestamp order by event_id (deterministic
    cross-engine); a same-timestamp event never opens a session (gap 0
    <= any non-negative threshold)."""
    if gap_minutes < 0:
        raise ValueError(f"gap_minutes must be >= 0: {gap_minutes}")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = secs - F.lag(secs).over(w_ord)
    flagged = events.withColumn(
        "new_sess",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.withColumn("session", F.sum("new_sess").over(w_run))
    return (
        sess.groupBy("user_id", "session")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id", F.col("session").cast("int").alias("session"),
            "session_start", "session_end", "n_events", "sum_value",
        )
    )


SESSIONIZE_SQL_TMPL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_sec}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session
  FROM flagged
)
SELECT user_id, session::int AS session,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*)::bigint AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY 1, 2
"""


def sessionize_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin of sessionize."""
    return SESSIONIZE_SQL_TMPL.format(gap_sec=gap_minutes * 60)


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within_minutes: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (the product-analytics staple): how many
    users reach each step IN SEQUENCE. A user's step-k time is their
    EARLIEST event of that type at-or-after their step-(k-1) time
    (equal timestamps count — an instantaneous follow-up converts);
    within_minutes, when set, bounds the WHOLE funnel from the user's
    step-1 time. Returns (step_idx, step, n_users, conversion) with
    conversion = this step's users / previous step's (6dp, step 1 = 1).

    Relational shape: one filtered min-aggregation per step, each
    joined to the previous step's (user, time) frame on user_id —
    len(steps) shuffles on the same key (Catalyst reuses the hash
    partitioning down the chain), then one union of the per-step user
    frames and one count. No window over all events, no self-join of
    the full event table: each stage touches only its own event type's
    rows."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps: {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct: {steps}")
    if within_minutes is not None and within_minutes <= 0:
        raise ValueError(f"within_minutes must be > 0: {within_minutes}")
    cur = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .withColumn("t1", F.col("t"))
    )
    frames = [cur.select("user_id").withColumn("idx", F.lit(1))]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col("event_type") == step)
            .select("user_id", F.col("ts").alias("t_next"))
            .join(cur.select("user_id", "t", "t1"), "user_id")
            .where(F.col("t_next") >= F.col("t"))
        )
        if within_minutes is not None:
            nxt = nxt.where(
                F.unix_timestamp(F.col("t_next").cast("timestamp"))
                <= F.unix_timestamp(F.col("t1").cast("timestamp"))
                + within_minutes * 60
            )
        cur = (
            nxt.groupBy("user_id", "t1")
            .agg(F.min("t_next").alias("t"))
            .select("user_id", "t", "t1")
        )
        frames.append(cur.select("user_id").withColumn("idx", F.lit(i)))
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    # every step emits a row even with zero users (a funnel report
    # with silently missing steps misreads as complete)
    spark = events.sparkSession
    step_frame = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps, start=1)],
        "idx int, step string",
    )
    counts = step_frame.join(
        uni.groupBy("idx").agg(F.count(F.lit(1)).alias("n")), "idx", "left"
    ).withColumn("n_users", F.coalesce("n", F.lit(0)))
    w = Window.orderBy("idx")
    prev = F.lag("n_users").over(w)
    conv = (
        F.when(prev.isNull(), F.lit(1.0))
        .when(prev > 0, F.round(F.col("n_users") / prev, 6))
        .otherwise(F.lit(0.0))
    )
    return counts.withColumn("conversion", conv).select(
        F.col("idx").cast("int").alias("step_idx"), "step",
        F.col("n_users").cast("long").alias("n_users"), "conversion",
    )


def funnel_sql(steps: list[str], within_minutes: int | None = None) -> str:
    """DuckDB twin of funnel_counts."""
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t, min(ts) AS t1 FROM events"
        f" WHERE event_type = '{steps[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        win = (
            f" AND epoch(e.ts) <= epoch(p.t1) + {within_minutes * 60}"
            if within_minutes is not None else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t, p.t1 AS t1"
            f" FROM events e JOIN s{i-1} p USING (user_id)"
            f" WHERE e.event_type = '{step}' AND e.ts >= p.t{win}"
            f" GROUP BY 1, 3)"
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS idx, '{s}' AS step, count(*) AS n FROM s{i}"
        for i, s in enumerate(steps, start=1)
    )
    return f"""
WITH {', '.join(ctes)},
cnt AS ({unions})
SELECT idx::int AS step_idx, step, n::bigint AS n_users,
       CASE WHEN lag(n) OVER (ORDER BY idx) IS NULL THEN 1.0
            WHEN lag(n) OVER (ORDER BY idx) > 0
              THEN round(n::double / lag(n) OVER (ORDER BY idx), 6)
            ELSE 0.0 END AS conversion
FROM cnt
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix — the third classic event-analytics
    report (with sessionization and funnels): users grouped by the
    epoch-week of their FIRST event, and for each later week the count
    of cohort members still active. Week boundaries are pure epoch
    arithmetic (floor(days-since-1970 / 7)), not calendar weeks —
    engine-neutral, no locale/ISO-week divergence.

    Returns (cohort_week, week_offset, n_users): cohort_week the
    cohort's epoch-week, week_offset 0..n weeks after it (offset 0 is
    the cohort size), n_users distinct active members.

    Shape: one min-aggregation per user, one distinct over (user,
    day), one join on user_id, one count-distinct fold — two exchanges
    on user_id plus the final matrix aggregation (cohort x offset
    cells, a bounded report frame)."""
    epoch = F.lit("1970-01-01")
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    act = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    joined = act.join(first, "user_id").select(
        "user_id",
        F.floor(F.datediff(F.col("d0"), epoch) / 7).alias("cohort_week"),
        F.floor(F.datediff(F.col("d"), F.col("d0")) / 7).alias(
            "week_offset"
        ),
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("int").alias("week_offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(ts::DATE) AS d0 FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, ts::DATE AS d FROM events
)
SELECT floor(datediff('day', DATE '1970-01-01', d0) / 7)::bigint
         AS cohort_week,
       floor(datediff('day', d0, d) / 7)::int AS week_offset,
       count(DISTINCT user_id)::bigint AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
"""
