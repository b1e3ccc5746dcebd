"""Watermark/windowed streaming aggregation semantics:
- windows finalized by the watermark are emitted exactly once (append);
- events later than the watermark bound are dropped;
- finalized-window contents match the equivalent batch aggregation."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F


def _land(df, tmpdir, landing, name):
    staging = os.path.join(tmpdir, "_stage_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(
        glob.glob(os.path.join(staging, "part-*.parquet"))[0],
        os.path.join(landing, name + ".parquet"),
    )
    shutil.rmtree(staging)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(ts=t, event_type=e, value=float(v)) for t, e, v in rows]
    ).select(
        F.to_timestamp("ts").alias("ts"), "event_type", F.col("value").cast("double")
    )


def test_watermark_window_semantics(spark, tmp_path):
    from terrier_ef_spark.streaming.events import run_events_stream

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    out = str(tmp_path / "out")

    # batch 1: events in windows 10:00 and 10:05; max ts 10:07
    _land(
        _events(spark, [
            ("2024-01-01 10:00:30", "click", 1),
            ("2024-01-01 10:01:10", "click", 2),
            ("2024-01-01 10:05:20", "view", 3),
            ("2024-01-01 10:07:00", "view", 4),
        ]),
        str(tmp_path), landing, "b1",
    )
    res1 = run_events_stream(spark, landing, out, window="5 minutes",
                             watermark="10 minutes")
    # watermark = 10:07 - 10min = 09:57 < every window end -> nothing final yet
    assert res1.count() == 0

    # batch 2: advance event time to 10:30 (watermark 10:20 closes both
    # early windows); include one LATE click at 10:02 which must be
    # dropped (later than the watermark after batch 1? no — late rows are
    # judged against the CURRENT watermark 09:57, so a 10:02 row in this
    # batch is still on time and lands in the 10:00 window)
    _land(
        _events(spark, [
            ("2024-01-01 10:02:00", "click", 10),
            ("2024-01-01 10:30:00", "tick", 0),
        ]),
        str(tmp_path), landing, "b2",
    )
    res2 = run_events_stream(spark, landing, out, window="5 minutes",
                             watermark="10 minutes")
    rows = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in res2.collect()
    }
    # both early windows finalized exactly once, incl. the on-time late row
    assert rows[("2024-01-01 10:00:00", "click")] == (3, 13.0)
    assert rows[("2024-01-01 10:05:00", "view")] == (2, 7.0)
    assert ("2024-01-01 10:30:00", "tick") not in rows  # still open

    # batch 3: a TOO-LATE row (10:03, watermark now 10:20) is dropped;
    # advancing to 10:45 closes the 10:30 window
    _land(
        _events(spark, [
            ("2024-01-01 10:03:00", "click", 100),  # beyond watermark -> dropped
            ("2024-01-01 10:45:00", "tick", 0),
        ]),
        str(tmp_path), landing, "b3",
    )
    res3 = run_events_stream(spark, landing, out, window="5 minutes",
                             watermark="10 minutes")
    rows3 = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in res3.collect()
    }
    # the closed click window was NOT re-emitted or modified
    assert rows3[("2024-01-01 10:00:00", "click")] == (3, 13.0)
    assert rows3[("2024-01-01 10:30:00", "tick")] == (1, 0.0)


def test_sessionize_hand_built(spark):
    """Gap-based sessionization: boundary gap == threshold does NOT
    split (strict > semantics), a longer gap does, users independent,
    same-timestamp ties order by event_id."""
    from datetime import datetime, timedelta

    from terrier_ef_spark.streaming.events import sessionize

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: three events 10 min apart (one session), then a
        # 31-min gap (new session)
        (1, 1, t0, 1.0),
        (2, 1, t0 + timedelta(minutes=10), 2.0),
        (3, 1, t0 + timedelta(minutes=20), 3.0),
        (4, 1, t0 + timedelta(minutes=51), 4.0),
        # user 2: gap EXACTLY 30 min -> same session
        (5, 2, t0, 10.0),
        (6, 2, t0 + timedelta(minutes=30), 20.0),
        # user 2: same-timestamp tie rides event_id order, no split
        (7, 2, t0 + timedelta(minutes=30), 30.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["session"]): (
            r["n_events"], r["sum_value"], r["session_start"]
        )
        for r in sessionize(ev, 30).collect()
    }
    assert got == {
        (1, 1): (3, 6.0, "2026-01-01 12:00:00"),
        (1, 2): (1, 4.0, "2026-01-01 12:51:00"),
        (2, 1): (3, 60.0, "2026-01-01 12:00:00"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gap_minutes"):
        sessionize(ev, -1)


def test_funnel_hand_built(spark):
    """Ordered funnel: sequence enforced (a click BEFORE the first
    view doesn't count), equal timestamps convert, the whole-funnel
    window drops late steps, zero-user steps still report."""
    from datetime import datetime, timedelta

    from terrier_ef_spark.streaming.events import funnel_counts

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view -> click (same ts) -> purchase: full funnel
        (1, 1, t0, "view"), (2, 1, t0, "click"),
        (3, 1, t0 + timedelta(minutes=5), "purchase"),
        # user 2: click BEFORE the view — never reaches step 2
        (4, 2, t0, "click"), (5, 2, t0 + timedelta(minutes=1), "view"),
        # user 3: view -> click, but purchase outside the 60-min window
        (6, 3, t0, "view"), (7, 3, t0 + timedelta(minutes=10), "click"),
        (8, 3, t0 + timedelta(minutes=90), "purchase"),
        # user 4: never views
        (9, 4, t0, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["step_idx"]: (r["step"], r["n_users"], r["conversion"])
        for r in funnel_counts(
            ev, ["view", "click", "purchase"], within_minutes=60
        ).collect()
    }
    assert got == {
        1: ("view", 3, 1.0),
        2: ("click", 2, round(2 / 3, 6)),
        3: ("purchase", 1, 0.5),
    }
    # zero-user step still reports, conversion 0 after it
    got2 = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(
            ev, ["view", "error", "purchase"], within_minutes=60
        ).collect()
    }
    assert got2 == {1: 3, 2: 0, 3: 0}
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 2 steps"):
        funnel_counts(ev, ["view"])
    with _pytest.raises(ValueError, match="distinct"):
        funnel_counts(ev, ["view", "view"])
    with _pytest.raises(ValueError, match="within_minutes"):
        funnel_counts(ev, ["view", "click"], within_minutes=0)


def test_retention_cohorts_hand_built(spark):
    """Epoch-week cohorts: offset 0 equals cohort size, a user active
    in two later weeks appears in both cells, distinct days dedup
    within a week."""
    from datetime import datetime, timedelta

    from terrier_ef_spark.streaming.events import retention_cohorts

    # 2026-01-05 is epoch day 20458 -> epoch week 2922 (floor/7)
    t0 = datetime(2026, 1, 5, 10, 0, 0)
    rows = [
        # users 1 and 2 join in week W; user 1 returns in W+1 and W+2
        (1, 1, t0), (2, 2, t0 + timedelta(days=1)),
        (3, 1, t0 + timedelta(days=8)),
        (4, 1, t0 + timedelta(days=9)),    # same week as day 8
        (5, 1, t0 + timedelta(days=15)),
        # user 3 joins two weeks later
        (6, 3, t0 + timedelta(days=14)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    w = 20458 // 7
    w3 = (20458 + 14) // 7
    assert got == {
        (w, 0): 2,   # users 1, 2
        (w, 1): 1,   # user 1 (two active days, one cell)
        (w, 2): 1,   # user 1
        (w3, 0): 1,  # user 3's own cohort
    }
