"""PII redaction for training-data pipelines: pure Catalyst
regexp_replace chains (whole-stage codegen, zero Python), with
DuckDB-twin SQL built from the SAME pattern literals so the oracle
proves cross-engine regex semantics, not just row counts.

Patterns deliberately stay in the Java-regex ∩ RE2 common dialect
(character classes, bounded repetition, \\b, non-capturing groups —
no lookbehind), so one literal drives both engines. Redaction is
per-row and embarrassingly parallel: at 100 TB this is a map-only
stage, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; earlier rules must
# not produce text later rules would re-match (replacements contain no
# digits or '@').
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("longnum", r"\b[0-9]{9,}\b", "<NUM>"),
]


def redact_expr(col: Column) -> Column:
    out = col
    for _, pat, rep in PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_count_expr(col: Column) -> Column:
    """Total PII matches across all rules (counted on the pre-redaction
    text per rule stage, same as the sequential replace sees)."""
    total = F.lit(0)
    cur = col
    for _, pat, rep in PII_RULES:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, rep)
    return total


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_clean, n_pii): text with emails / IPv4s / long
    digit runs replaced by typed placeholders, plus the match count."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        redact_expr(c).alias("text_clean"),
        pii_count_expr(c).cast("long").alias("n_pii"),
    )


def redact_sql(text_expr: str = "text") -> str:
    """DuckDB twin over the same literals ('g' flag = replace-all, the
    Spark default)."""
    clean = text_expr
    counts = []
    cur = text_expr
    for _, pat, rep in PII_RULES:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
        clean = f"regexp_replace({clean}, '{pat}', '{rep}', 'g')"
    return f"""
SELECT doc_id, {clean} AS text_clean,
       ({' + '.join(counts)})::bigint AS n_pii
FROM documents
"""
