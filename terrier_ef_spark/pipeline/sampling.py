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


def mixture_rates(
    docs: DataFrame,
    *,
    by: str = "lang",
    temperature: float = 2.0,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based domain-mixture reweighting (the multilingual /
    multi-source training-mixture rule of mT5/XLM-R/PaLM: target share
    w_d ∝ n_d^(1/T); T = 1 keeps the natural mixture, T > 1 flattens
    toward uniform — upweights rare domains — and T → ∞ is uniform):
    derive a per-domain sampling rate that
    realizes the target mixture inside a without-replacement budget of
    budget_frac * N documents.

        rate_d = min(1, budget_frac * N * share_d / n_d)

    Rates cap at 1 (no upsampling — a dominant rare-domain target can
    leave the budget underfilled; redistribution is deliberately NOT
    applied so rates stay a closed-form function of the counts).
    Returns one row per domain: (<by>, n_docs, share, rate), share and
    rate rounded to 6dp (the repo-wide cross-engine stability cut).

    Scale shape: one map-side-combined count aggregation to #domains
    rows, a 1-row total broadcast — the whole rate table is
    domain-count-sized and never touches the driver."""
    if not 0 < temperature:
        raise ValueError(f"temperature must be > 0: {temperature}")
    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1]: {budget_frac}")
    a = 1.0 / temperature
    cnt = docs.groupBy(by).agg(F.count("*").cast("double").alias("n"))
    # totals get distinct names: Spark resolves case-insensitively, so
    # an `N` column would collide with cnt's `n` after the crossJoin
    tot = cnt.agg(
        F.sum("n").alias("tot_n"), F.sum(F.pow("n", a)).alias("tot_z")
    )
    share = F.pow("n", a) / F.col("tot_z")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            by,
            F.col("n").cast("long").alias("n_docs"),
            F.round(share, 6).alias("share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget_frac) * F.col("tot_n") * share / F.col("n"),
                ),
                6,
            ).alias("rate"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    *,
    by: str = "lang",
    temperature: float = 2.0,
    budget_frac: float = 0.5,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministically sample docs to the mixture_rates targets: keep
    a doc iff its md5 hash fraction < its domain's 6dp rate. Returns
    (doc_id, <by>) — reproducible at any parallelism, zero shuffle on
    the doc side (the rate table is a broadcast join)."""
    rates = mixture_rates(
        docs, by=by, temperature=temperature, budget_frac=budget_frac
    ).select(by, "rate")
    return (
        docs.select("doc_id", by)
        .join(F.broadcast(rates), by)
        .where(_frac_expr(salt) < F.col("rate"))
        .select("doc_id", by)
    )


def mixture_sample_sql(
    *,
    by: str = "lang",
    temperature: float = 2.0,
    budget_frac: float = 0.5,
    salt: str = "mixture",
    rates_only: bool = False,
) -> str:
    """DuckDB twin of mixture_rates / mixture_sample (same count ->
    pow-share -> capped-rate derivation, same md5 fraction)."""
    a = 1.0 / temperature
    frac = (
        f"(('0x' || substring(md5('{salt}' || '|' || doc_id::VARCHAR),"
        f" 1, {_FRAC_DIGITS}))::BIGINT::DOUBLE / {16**_FRAC_DIGITS})"
    )
    rates = f"""
WITH cnt AS (
  SELECT {by}, count(*)::DOUBLE AS n FROM documents GROUP BY 1
), tot AS (
  SELECT sum(n) AS tot_n, sum(pow(n, {a!r})) AS tot_z FROM cnt
), rates AS (
  SELECT {by}, n::BIGINT AS n_docs,
         round(pow(n, {a!r}) / tot_z, 6) AS share,
         round(least(1.0,
                     {budget_frac!r} * tot_n * pow(n, {a!r}) / tot_z / n), 6)
           AS rate
  FROM cnt CROSS JOIN tot
)"""
    if rates_only:
        return rates + f"\nSELECT {by}, n_docs, share, rate FROM rates"
    return rates + f"""
SELECT d.doc_id, d.{by} FROM documents d JOIN rates r USING ({by})
WHERE {frac} < r.rate
"""
