"""Import / dependency extraction over a source-code corpus — the
dependency-graph role (Sourcegraph's dependency search, deps.dev,
GitHub's dependency graph) next to query/symbols.py's ctags role.

A definition tells you what a file PROVIDES; an import tells you what
it CONSUMES. Over a repo corpus the consumed-module relation answers
the questions a code platform is actually asked at scale: what are
the most-depended-on modules, which repos consume module X (reverse
dependencies / blast radius of a breaking change), what does this
file pull in.

Mechanically this is the symbols machinery with an import rule table:
one content scan, all per-language regex families evaluated inside
the projection and exploded map-side, one (doc, kind, module) count
fold as the only shuffle (see extract_symbols for the scan-shape
argument). The rules are ctags-style conservative line families kept
inside the Java-regex/RE2 agreement subset, matching the dominant
import spelling per language:

  py          import a.b / from a.b import name   (the generic rule
              also captures the imported NAME after `from X import` —
              a documented over-approximation: the name is a consumed
              binding too)
  java/scala/kt  import [static] a.b.C
  go          import "x/y"           (adjacent-quoted form; factored
              import blocks are out of the conservative subset)
  js/ts       require("mod") / from "mod"
  rs/php      use a::b / use Ns\\Cls  (word/colon path)
  c/cpp       #include <x.h> / #include "x.h"

Content is NOT case-folded (unlike symbol extraction): module
identity is case-sensitive on every real package system; the import
keywords are lowercase in any code that compiles.

Reference parity note: terrier-ef has no dependency surface; this
module belongs to the source-code corpus mandate (BASELINE.json
input_hint), composing with snapshot_latest (one version per file
before counting) and the repo column for reverse-dependency counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from terrier_ef_spark.query.symbols import extract_symbols

__all__ = [
    "IMPORT_RULES",
    "extract_imports",
    "imports_sql_duckdb",
    "top_imported_modules",
    "reverse_dependencies",
]

# (kind, pattern-with-one-capture-group, languages) — same contract
# as SYMBOL_RULES: valid under BOTH Java regex and RE2 (no
# lookarounds, no backreferences).
IMPORT_RULES: list[tuple[str, str, tuple[str, ...] | None]] = [
    ("import", r"\bimport\s+(?:static\s+)?([\w\.]+)",
     ("py", "java", "scala", "kt")),
    ("from_import", r"\bfrom\s+([\w\.]+)\s+import\b", ("py",)),
    ("import_quoted", r"\bimport\s+\"([\w\./-]+)\"", ("go",)),
    ("require", r"\brequire\([\"']([\w\./@-]+)[\"']\)", ("js", "ts")),
    ("from_module", r"\bfrom\s+[\"']([\w\./@-]+)[\"']", ("js", "ts")),
    ("use", r"\buse\s+([\w:\\\\]+)", ("rs", "php")),
    ("include", r"#include\s*[<\"]([\w\./]+)[>\"]", ("c", "cpp")),
]


def extract_imports(
    docs: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """(doc_id, kind, module, n_refs) from one content scan — the
    symbols scan shape with the import rule table, case-SENSITIVE."""
    out = extract_symbols(
        docs,
        content_col=content_col,
        id_col=id_col,
        lang_col=lang_col,
        rules=IMPORT_RULES,
        case_fold=False,
    )
    return (
        out.withColumnRenamed("symbol", "module")
        .withColumnRenamed("n_defs", "n_refs")
    )


def imports_sql_duckdb(
    source_sql: str,
    *,
    content_expr: str = "content",
    id_expr: str = "doc_id",
    lang_expr: str | None = "lang",
) -> str:
    """DuckDB twin of extract_imports — the symbols twin's RE2
    formulation with the import rules, no case folding, and SQL
    single-quote escaping for the quoted-module patterns."""
    parts = []
    for kind, pattern, langs in IMPORT_RULES:
        pat = pattern.replace("'", "''")
        where = ""
        if lang_expr is not None and langs is not None:
            quoted = ", ".join(f"'{lg}'" for lg in langs)
            where = f" WHERE {lang_expr} IN ({quoted})"
        parts.append(
            f"SELECT {id_expr} AS doc_id, '{kind}' AS kind,\n"
            f"       unnest(regexp_extract_all({content_expr},"
            f" '{pat}', 1)) AS module\nFROM {source_sql}{where}"
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        "SELECT doc_id, kind, module, count(*)::bigint AS n_refs\n"
        f"FROM (\n{body}\n)\nGROUP BY 1, 2, 3"
    )


def top_imported_modules(
    imports: DataFrame,
    doc_meta: DataFrame | None = None,
    *,
    k: int = 20,
    repo_col: str = "repo",
) -> DataFrame:
    """The most-depended-on modules: (rank, module, n_docs, n_refs
    [, n_repos]) — n_docs = importing documents, n_refs = total
    import statements, n_repos = distinct repositories when doc_meta
    (doc_id -> repo) is supplied. Rank by (n_docs desc, module asc).

    Scale shape: one fold of the already-small import relation to
    #modules rows, then ONE global top-k window over that fold —
    module cardinality is package-ecosystem-sized (10^5-10^6), not
    corpus-sized, so the single-partition window input is bounded.
    doc_meta joins on doc_id BEFORE the fold (a corpus-sized but
    import-relation-bounded hash join)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    src = imports
    aggs = [
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_refs").cast("long").alias("n_refs"),
    ]
    if doc_meta is not None:
        src = src.join(
            doc_meta.select("doc_id", F.col(repo_col).alias("_repo")),
            "doc_id",
        )
        aggs.append(F.countDistinct("_repo").alias("n_repos"))
    folded = src.groupBy("module").agg(*aggs)
    w = Window.orderBy(F.desc("n_docs"), F.asc("module"))
    ranked = folded.withColumn("rank", F.row_number().over(w))
    cols = ["rank", "module", "n_docs", "n_refs"]
    if doc_meta is not None:
        cols.append("n_repos")
    return ranked.where(F.col("rank") <= k).select(*cols)


def reverse_dependencies(
    imports: DataFrame,
    modules: list[str],
    doc_meta: DataFrame | None = None,
    *,
    repo_col: str = "repo",
) -> DataFrame:
    """Who consumes these modules — the blast-radius query for a
    breaking change: (module, doc_id[, repo], n_refs) for the given
    module names. The literal IN predicate pushes into the imports
    scan (row-group pruning when the relation is materialized sorted
    by module, the symbols-artifact discipline)."""
    if not modules:
        raise ValueError("need at least one module name")
    out = imports.where(
        F.col("module").isin([str(m) for m in modules])
    ).select("module", "doc_id", "n_refs")
    if doc_meta is not None:
        out = out.join(
            doc_meta.select("doc_id", F.col(repo_col).alias("repo")),
            "doc_id",
        ).select("module", "doc_id", "repo", "n_refs")
    return out
