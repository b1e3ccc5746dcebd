"""Version-history analytics over the full-history corpus shape —
file churn / hotspots and co-change (logical) coupling.

The input-hint Iceberg table (repo, path, commit, lang, content)
carries EVERY version of every file (corpus.snapshot_latest folds it
to one winner per file before an index build). Before folding, the
history itself answers the code-platform questions mined from version
control since Gall et al. ICSM'98 and Zimmermann et al. ICSE'04
("mining version histories to guide software changes"):

  churn:     how often does each file change — the hotspot signal
             (defect density tracks change frequency; hotspot files
             are review/ownership targets).
  co-change: which files change TOGETHER (same commit) — logical
             coupling: dependencies no import statement records
             (config + code, schema + migration, header + impl).

Scale shape: churn is one (repo, path) fold with map-side partial
aggregation — the shuffle carries ~one partial row per file per
input partition, the snapshot_latest argument. Co-change buckets by
commit and self-joins WITHIN the bucket, so it rides the dedup.py
LSH discipline: commits touching more than `max_commit_files` files
(tree-wide reformats, vendored-drop imports) are excluded BEFORE the
self-join — an M-file commit would emit M^2 pairs and carries no
coupling signal anyway — and stay enumerable in a ledger.

Reference parity note: terrier-ef has no history surface; this module
belongs to the source-code corpus mandate next to snapshot_latest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from terrier_ef_spark.util import eager_release

__all__ = [
    "file_churn",
    "hotspot_files",
    "cochange_pairs",
    "cochange_skipped_commits",
    "COCHANGE_MAX_COMMIT_FILES",
]

# Commits touching more files than this are bulk operations, not
# coupling evidence (the standard mining-literature cut).
COCHANGE_MAX_COMMIT_FILES = 100

_REQUIRED = ("repo", "path", "commit")


def _check_cols(history: DataFrame, op: str) -> None:
    missing = [c for c in _REQUIRED if c not in history.columns]
    if missing:
        raise ValueError(
            f"{op} needs columns {_REQUIRED}; missing {missing}"
        )


def file_churn(history: DataFrame) -> DataFrame:
    """(repo, path, n_versions, n_commits, first_commit, last_commit)
    per file over the full-history relation: n_versions = stored
    version rows, n_commits = distinct commits touching the file,
    first/last by the commit column's total order (a deterministic
    stand-in for chronology — the snapshot_latest ordering caveat
    applies; substitute a timestamp order column when the source has
    one). One fold with map-side partial aggregation."""
    _check_cols(history, "file_churn")
    return history.groupBy("repo", "path").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.countDistinct("commit").alias("n_commits"),
        F.min("commit").alias("first_commit"),
        F.max("commit").alias("last_commit"),
    )


def hotspot_files(history: DataFrame, *, k: int = 20) -> DataFrame:
    """The most-changed files: churn ranked by (n_commits desc,
    repo asc, path asc), top k with rank — file cardinality is
    bounded by the corpus, and the single top-k window runs over the
    already-folded churn relation."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    ch = file_churn(history)
    w = Window.orderBy(F.desc("n_commits"), F.asc("repo"), F.asc("path"))
    return (
        ch.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "repo", "path", "n_versions", "n_commits",
                "first_commit", "last_commit")
    )


def cochange_pairs(
    history: DataFrame,
    *,
    min_cochanges: int = 2,
    max_commit_files: int | None = COCHANGE_MAX_COMMIT_FILES,
) -> DataFrame:
    """Logical-coupling pairs: (repo_a, path_a, repo_b, path_b,
    n_cochanges) for files changed together in >= min_cochanges
    distinct commits, (repo_a, path_a) < (repo_b, path_b) tuple-wise.
    Commits touching more than max_commit_files files are excluded
    before the self-join (bulk commits are M^2 noise); enumerate them
    with cochange_skipped_commits. The cap window and the join share
    the commit hash partitioning — no extra shuffle."""
    _check_cols(history, "cochange_pairs")
    if min_cochanges < 1:
        raise ValueError(f"need min_cochanges >= 1, got {min_cochanges}")
    touched = history.select("commit", "repo", "path").distinct()
    if max_commit_files is not None:
        cw = Window.partitionBy("commit")
        touched = (
            touched.withColumn("_cn", F.count(F.lit(1)).over(cw))
            .where(F.col("_cn") <= max_commit_files)
            .drop("_cn")
        )
    touched = touched.persist()  # self-join reuses both sides
    a, b = touched.alias("a"), touched.alias("b")
    pairs = (
        a.join(b, "commit")
        .where(
            F.struct(F.col("a.repo"), F.col("a.path"))
            < F.struct(F.col("b.repo"), F.col("b.path"))
        )
        .groupBy(
            F.col("a.repo").alias("repo_a"),
            F.col("a.path").alias("path_a"),
            F.col("b.repo").alias("repo_b"),
            F.col("b.path").alias("path_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cochanges"))
        .where(F.col("n_cochanges") >= min_cochanges)
    )
    return eager_release(pairs, touched)


def cochange_skipped_commits(
    history: DataFrame, *, max_commit_files: int = COCHANGE_MAX_COMMIT_FILES
) -> DataFrame:
    """(commit, n_files) for every commit the co-change cap excluded
    — the explicit no-silent-truncation ledger."""
    _check_cols(history, "cochange_skipped_commits")
    return (
        history.select("commit", "repo", "path")
        .distinct()
        .groupBy("commit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_files"))
        .where(F.col("n_files") > max_commit_files)
    )
