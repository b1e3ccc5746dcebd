"""Deterministic splitting and sampling for training-data pipelines.

Both operators are pure per-row projections — zero shuffle, zero
state, reproducible at any parallelism and across reruns/backfills
(unlike DataFrame.sample / randomSplit, whose results depend on
partitioning and seed plumbing). The assignment hash is
md5(salt|doc_id) mapped to a uniform fraction in [0, 1), so the same
(doc_id, salt) lands in the same split on every engine — the DuckDB
oracle twin reproduces assignments bit-for-bit.

At 100 TB this is the shape you want: split/sample are scan-local
column computations that Catalyst fuses into whatever else reads the
table; nothing is sorted, sampled by partition, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 13 hex digits = 52 bits: every value exactly representable in a
# double, so int->double conversion can't round differently anywhere
_FRAC_DIGITS = 13
_FRAC_DENOM = float(16**_FRAC_DIGITS)


def _frac_expr(salt: str):
    """Uniform [0, 1) fraction from md5(salt|doc_id) — the first 13 hex
    digits as an integer over 16^13 (52 bits -> exact in a double)."""
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string")))
    return F.conv(F.substring(h, 1, _FRAC_DIGITS), 16, 10).cast("double") / F.lit(
        _FRAC_DENOM
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every doc to a named split by cumulative weight ranges
    over the deterministic hash fraction. Returns (doc_id, split).

    weights must sum to 1 (validated); default 90/5/5 train/val/test.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = _frac_expr(salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = frac < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return docs.select("doc_id", expr.alias("split"))


def hash_split_sql(
    weights: dict[str, float] | None = None, salt: str = "split"
) -> str:
    """DuckDB twin of hash_split (same md5-fraction assignment)."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    names = list(weights)
    frac = (
        f"(('0x' || substring(md5('{salt}' || '|' || doc_id::VARCHAR),"
        f" 1, {_FRAC_DIGITS}))::BIGINT::DOUBLE / {16**_FRAC_DIGITS})"
    )
    case = "CASE"
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        case += f" WHEN {frac} < {cum!r} THEN '{name}'"
    case += f" ELSE '{names[-1]}' END"
    return f"SELECT doc_id, {case} AS split FROM documents"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    by: str = "lang",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff its hash
    fraction < fractions[stratum]. Strata absent from `fractions` are
    dropped (fraction 0). Returns the sampled (doc_id, <by>) rows —
    exactly reproducible, engine-independent, zero shuffle."""
    frac = _frac_expr(salt)
    thr = None
    for stratum, p in fractions.items():
        cond = F.col(by) == stratum
        thr = F.when(cond, float(p)) if thr is None else thr.when(cond, float(p))
    thr = F.lit(0.0) if thr is None else thr.otherwise(F.lit(0.0))
    return docs.select("doc_id", by, frac.alias("_f")).where(
        F.col("_f") < thr
    ).select("doc_id", by)


def stratified_sample_sql(
    fractions: dict[str, float], by: str = "lang", salt: str = "sample"
) -> str:
    """DuckDB twin of stratified_sample."""
    frac = (
        f"(('0x' || substring(md5('{salt}' || '|' || doc_id::VARCHAR),"
        f" 1, {_FRAC_DIGITS}))::BIGINT::DOUBLE / {16**_FRAC_DIGITS})"
    )
    case = "CASE " + " ".join(
        f"WHEN {by} = '{s}' THEN {float(p)!r}" for s, p in fractions.items()
    ) + " ELSE 0.0 END"
    return f"SELECT doc_id, {by} FROM documents WHERE {frac} < {case}"
