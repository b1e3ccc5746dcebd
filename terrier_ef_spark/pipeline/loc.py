"""Lines-of-code accounting over a source-code corpus — the
cloc / tokei / scc role: per-file physical lines, blank lines,
line-comment lines and code lines, and the per-language rollup those
tools print as their report.

Classification is the line-prefix model those tools apply to line
comments: a line is BLANK if it trims to nothing, a COMMENT if its
trimmed form starts with the language's line-comment marker, CODE
otherwise. Block comments (/* .. */) are deliberately out of scope —
cloc itself documents the limits of lexing-free counting; a trailing
comment after code counts as code (the tools agree).

Scale shape: map-only — every per-line count is a Catalyst
higher-order expression (split + filter + size) over the row's own
content, no shuffle for sloc_stats at any corpus size; the rollup is
one language-cardinality fold with map-side combine. The per-element
lambda cost is per LINE (tens per document), not per character —
outside the interpreted-HOF regime that made the trigram tokenizer a
pandas UDF (measured there at ~thousands of elements per document).

Reference parity note: terrier-ef has no LOC surface; source-code
corpus mandate, next to symbols/imports extraction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "LINE_COMMENT_MARKERS",
    "sloc_stats",
    "loc_by_lang",
    "sloc_sql_duckdb",
    "loc_by_lang_sql_duckdb",
]

# language -> line-comment marker (the tokei table's line-comment
# column for the languages the corpus mandate names). A language
# absent here (or a corpus without a lang column) counts comments
# as 0 — unknown syntax must not misclassify code.
LINE_COMMENT_MARKERS: dict[str, str] = {
    "py": "#", "sh": "#", "rb": "#", "yaml": "#", "toml": "#",
    "js": "//", "ts": "//", "go": "//", "java": "//", "c": "//",
    "cpp": "//", "rs": "//", "scala": "//", "kt": "//", "php": "//",
    "sql": "--", "lua": "--",
}


def _marker_col(lang_col: str):
    expr = F.lit(None).cast("string")
    for lg, mk in LINE_COMMENT_MARKERS.items():
        expr = F.when(F.col(lang_col) == lg, F.lit(mk)).otherwise(expr)
    return expr


# bare trim() strips ONLY spaces in both Spark and DuckDB — a
# tab-indented comment would misclassify as code; strip the explicit
# horizontal-whitespace set on both engines
_WS = " \t\r"


def _stat_exprs(content_col: str, lang_col: str | None):
    lines = F.split(F.col(content_col), "\n")
    n_lines = F.size(lines).cast("long")
    n_blank = F.size(
        F.filter(lines, lambda x: F.trim(x, F.lit(_WS)) == "")
    ).cast("long")
    if lang_col is not None:
        mk = _marker_col(lang_col)
        n_comment = (
            F.when(mk.isNull(), F.lit(0)).otherwise(
                F.size(
                    F.filter(
                        lines,
                        # \x00 placeholder keeps the lambda total when
                        # the marker is null (the branch is dead then)
                        lambda x: F.startswith(
                            F.trim(x, F.lit(_WS)),
                            F.coalesce(mk, F.lit("\x00")),
                        ),
                    )
                )
            )
        ).cast("long")
    else:
        n_comment = F.lit(0).cast("long")
    return [
        n_lines.alias("n_lines"),
        n_blank.alias("n_blank"),
        n_comment.alias("n_comment"),
        (n_lines - n_blank - n_comment).alias("n_code"),
    ]


def sloc_stats(
    docs: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """(doc_id, n_lines, n_blank, n_comment, n_code) per document.
    n_lines counts physical lines (split on \\n); n_blank trims to
    empty; n_comment = trimmed line starts with the language's
    line-comment marker; n_code = the rest. Map-only."""
    if lang_col is not None and lang_col not in docs.columns:
        lang_col = None
    return docs.select(
        F.col(id_col).alias("doc_id"), *_stat_exprs(content_col, lang_col)
    )


def loc_by_lang(
    docs: DataFrame,
    *,
    content_col: str = "content",
    lang_col: str = "lang",
) -> DataFrame:
    """The cloc report: (lang, n_files, n_lines, n_blank, n_comment,
    n_code) totals per language — the per-file stats computed inline
    in the scan projection (no join back to the corpus) and folded
    once to language cardinality with map-side combine."""
    if lang_col not in docs.columns:
        raise ValueError(f"loc_by_lang needs a {lang_col!r} column")
    per = docs.select(
        F.col(lang_col).alias("lang"), *_stat_exprs(content_col, lang_col)
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum("n_blank").cast("long").alias("n_blank"),
        F.sum("n_comment").cast("long").alias("n_comment"),
        F.sum("n_code").cast("long").alias("n_code"),
    )


def _marker_case_sql(lang_expr: str) -> str:
    whens = " ".join(
        f"WHEN '{lg}' THEN '{mk}'"
        for lg, mk in LINE_COMMENT_MARKERS.items()
    )
    return f"CASE {lang_expr} {whens} ELSE NULL END"


_WS_SQL = "' ' || chr(9) || chr(13)"


def _sloc_cte_sql(src_sql: str, content_expr: str, id_expr: str,
                  lang_expr: str | None, keep: str) -> str:
    marker = (
        _marker_case_sql(lang_expr) if lang_expr is not None else "NULL"
    )
    return f"""(
  SELECT {keep},
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines,
             x -> trim(x, {_WS_SQL}) = ''))::BIGINT AS n_blank,
         (CASE WHEN marker IS NULL THEN 0 ELSE
            len(list_filter(lines,
                x -> starts_with(trim(x, {_WS_SQL}), marker)))
          END)::BIGINT AS n_comment
  FROM (SELECT {keep},
               str_split({content_expr}, chr(10)) AS lines,
               {marker} AS marker
        FROM {src_sql})
)"""


def sloc_sql_duckdb(
    src_sql: str,
    *,
    content_expr: str = "content",
    id_expr: str = "doc_id",
    lang_expr: str | None = "lang",
) -> str:
    """DuckDB twin of sloc_stats over `src_sql` — the same line
    classification via list lambdas, explicit whitespace trim set."""
    cte = _sloc_cte_sql(
        src_sql, content_expr, id_expr, lang_expr, f"{id_expr} AS doc_id"
    )
    return f"""
SELECT doc_id, n_lines, n_blank, n_comment,
       (n_lines - n_blank - n_comment)::BIGINT AS n_code
FROM {cte} s
"""


def loc_by_lang_sql_duckdb(
    src_sql: str,
    *,
    content_expr: str = "content",
    lang_expr: str = "lang",
) -> str:
    """DuckDB twin of loc_by_lang: per-language totals."""
    cte = _sloc_cte_sql(
        src_sql, content_expr, "doc_id", lang_expr, f"{lang_expr} AS lang"
    )
    return f"""
SELECT lang, count(*)::BIGINT AS n_files,
       sum(n_lines)::BIGINT AS n_lines,
       sum(n_blank)::BIGINT AS n_blank,
       sum(n_comment)::BIGINT AS n_comment,
       sum(n_lines - n_blank - n_comment)::BIGINT AS n_code
FROM {cte} s
GROUP BY 1
"""
