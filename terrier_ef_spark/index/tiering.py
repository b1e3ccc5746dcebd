"""Hierarchical segment compaction: merge N segments with bounded
fan-in.

A log-structured build (streaming epochs, per-day partitions, per-crawl
segments) accumulates many small indexes. merge_many folds any number
of them in one pass, but a single 10,000-way union makes one job
responsible for every byte and loses all incrementality (one failure =
restart everything). The classic LSM answer is bounded fan-in: merge F
segments at a time, level by level, giving

    passes over the data = ceil(log_F n)     (each byte written once
                                              per level)

vs n-1 passes for a pairwise chain. Because merge_many is zero-recode
(every EF blob byte rides through each level verbatim, only block-id
metadata relabels), a level here costs parquet I/O only — the blob
bytes are never decoded at ANY level, so hierarchical compaction keeps
merge_many's core property while bounding per-job blast radius.

Docids shift by composed block-aligned offsets, so absolute docids
differ from a flat one-shot merge (extra alignment gaps at inner
levels) — docnos, postings, and scores are identical, which is what
the tests pin (docno-keyed equality vs flat merge).

The planner is pure (no Spark): it returns the merge tree so callers
can run levels as separate scheduled jobs, checkpoint between them, or
inspect write amplification before committing to a plan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from terrier_ef_spark.index.merge import merge_many
from terrier_ef_spark.index.reader import EFIndex


def plan_merge_tree(n_segments: int, fan_in: int = 8) -> list[list[list[int]]]:
    """Merge schedule for n segments at the given fan-in: a list of
    levels, each level a list of merge groups (indexes into the
    previous level's output order; level 0 indexes the input segments).
    Input order is preserved through every level, so docid order is the
    same as a flat merge_many's (offsets differ only by alignment).
    Groups of one are carried through without a merge job."""
    if n_segments < 1:
        raise ValueError("need at least one segment")
    if fan_in < 2:
        raise ValueError("fan_in must be >= 2")
    levels: list[list[list[int]]] = []
    count = n_segments
    while count > 1:
        groups = [
            list(range(i, min(i + fan_in, count)))
            for i in range(0, count, fan_in)
        ]
        levels.append(groups)
        count = len(groups)
    return levels


def write_amplification(n_segments: int, fan_in: int = 8) -> int:
    """Upper bound on how many times the plan writes each input byte
    (= number of levels = ceil(log_fan_in n); bytes riding a
    carried-through singleton skip that level's write)."""
    return len(plan_merge_tree(n_segments, fan_in)) if n_segments > 1 else 0


def compact_segments(
    spark: SparkSession,
    dirs: list[str],
    out_root: str,
    *,
    fan_in: int = 8,
    n_partitions: int = 32,
) -> EFIndex:
    """Fold `dirs` into one index under out_root via the bounded-fan-in
    plan. Intermediate levels live in out_root/level<k>/g<j>; the final
    index is out_root/final. Each group merge is an independent,
    restartable merge_many job."""
    if not dirs:
        raise ValueError("need at least one segment")
    if len(dirs) == 1:
        raise ValueError(
            "one segment needs no compaction — open it directly"
        )
    current = list(dirs)
    levels = plan_merge_tree(len(dirs), fan_in)
    last: EFIndex | None = None
    for li, groups in enumerate(levels):
        nxt: list[str] = []
        # the final level is always ONE group of >= 2 members (the loop
        # in plan_merge_tree runs until count == 1, and a level entered
        # with 2..fan_in members emits a single real merge)
        is_last_level = li == len(levels) - 1
        for gi, group in enumerate(groups):
            members = [current[i] for i in group]
            if len(members) == 1:
                nxt.append(members[0])  # singleton rides to the next level
                continue
            out = (
                os.path.join(out_root, "final")
                if is_last_level
                else os.path.join(out_root, f"level{li}", f"g{gi}")
            )
            last = merge_many(spark, members, out,
                              n_partitions=n_partitions)
            nxt.append(out)
        current = nxt
    assert last is not None
    return last
