"""Import / dependency extraction (query/imports.py — the
dependency-graph role next to the symbols ctags role).

Same verification discipline as test_symbols.py: three independent
formulations (Spark Java regex, DuckDB RE2, stdlib re) must agree on
extraction, per-language rule gating must hold, and the aggregation
surfaces must match hand-computed expectations."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from terrier_ef_spark.query.imports import (
    IMPORT_RULES,
    extract_imports,
    imports_sql_duckdb,
    reverse_dependencies,
    top_imported_modules,
)

DOCS = [
    (1, "py", "import os.path\nfrom collections import Counter\n"
              "some prose here"),
    (2, "java", "import static org.junit.Assert;\nimport java.util.List;"),
    (3, "go", 'import "net/http"\nimport "github.com/x/y"\nfunc main()'),
    (4, "js", 'const a = require("lodash");\nimport {b} from "./util"'),
    (5, "rs", "use std::collections::HashMap;\nuse serde;"),
    (6, "c", '#include <stdio.h>\n#include "local/hdr.h"'),
    (7, "md", "import os.path — prose about imports, never extracted"),
]

EXPECTED = {
    1: {("import", "os.path"), ("import", "Counter"),
        ("from_import", "collections")},
    2: {("import", "org.junit.Assert"), ("import", "java.util.List")},
    3: {("import_quoted", "net/http"),
        ("import_quoted", "github.com/x/y")},
    4: {("require", "lodash"), ("from_module", "./util")},
    5: {("use", "std::collections::HashMap"), ("use", "serde")},
    6: {("include", "stdio.h"), ("include", "local/hdr.h")},
    7: set(),  # md has no rules: gating
}


@pytest.fixture(scope="module")
def imp_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, lang string, content string"
    )


@pytest.fixture(scope="module")
def imp_pdf(imp_df):
    return extract_imports(imp_df).toPandas()


def test_extraction_per_language(imp_pdf):
    got = {
        did: set(zip(g["kind"], g["module"]))
        for did, g in imp_pdf.groupby("doc_id")
    }
    for did, exp in EXPECTED.items():
        assert got.get(did, set()) == exp, f"doc {did}"
    # the py over-approximation is pinned: `from X import Y` yields
    # BOTH the from_import module X and the generic-rule binding Y
    assert ("import", "Counter") in got[1]


def test_duckdb_twin_agrees(imp_df, imp_pdf):
    con = duckdb.connect()
    con.register("src", imp_df.toPandas())
    twin = con.sql(imports_sql_duckdb("src")).df()
    key = ["doc_id", "kind", "module", "n_refs"]
    a = imp_pdf[key].sort_values(key).reset_index(drop=True)
    b = twin[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_python_re_third_formulation(imp_pdf):
    rows = []
    for did, lang, content in DOCS:
        for kind, pattern, langs in IMPORT_RULES:
            if langs is not None and lang not in langs:
                continue
            for m in re.findall(pattern, content):
                rows.append((did, kind, m))
    mirror = (
        pd.DataFrame(rows, columns=["doc_id", "kind", "module"])
        .groupby(["doc_id", "kind", "module"], as_index=False)
        .size()
        .rename(columns={"size": "n_refs"})
    )
    key = ["doc_id", "kind", "module", "n_refs"]
    a = imp_pdf[key].sort_values(key).reset_index(drop=True)
    b = mirror[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_top_modules_with_repos(spark):
    docs = spark.createDataFrame(
        [
            (1, "py", "import numpy\nimport numpy\nimport pandas"),
            (2, "py", "import numpy"),
            (3, "py", "import pandas"),
            (4, "py", "import numpy"),
        ],
        "doc_id long, lang string, content string",
    )
    meta = spark.createDataFrame(
        [(1, "ra"), (2, "ra"), (3, "rb"), (4, "rb")],
        "doc_id long, repo string",
    )
    imp = extract_imports(docs)
    top = top_imported_modules(imp, meta, k=10).toPandas()
    top = top.set_index("module")
    assert list(top.index) == ["numpy", "pandas"]  # 3 docs vs 2
    assert top.loc["numpy"].n_docs == 3
    assert top.loc["numpy"].n_refs == 4  # doc 1 imports it twice
    assert top.loc["numpy"].n_repos == 2
    assert top.loc["pandas"].n_repos == 2
    assert list(top["rank"]) == [1, 2]
    # without metadata: no n_repos column
    bare = top_imported_modules(imp, k=1).toPandas()
    assert "n_repos" not in bare.columns and len(bare) == 1


def test_reverse_dependencies(spark):
    docs = spark.createDataFrame(
        [(1, "py", "import a\nimport b"), (2, "py", "import a")],
        "doc_id long, lang string, content string",
    )
    meta = spark.createDataFrame(
        [(1, "r1"), (2, "r2")], "doc_id long, repo string"
    )
    imp = extract_imports(docs)
    rd = reverse_dependencies(imp, ["a"], meta).toPandas()
    assert set(zip(rd.module, rd.doc_id, rd.repo)) == {
        ("a", 1, "r1"), ("a", 2, "r2")
    }
    assert "b" not in set(rd.module)


def test_guards(spark, imp_df):
    imp = extract_imports(imp_df)
    with pytest.raises(ValueError, match="k >= 1"):
        top_imported_modules(imp, k=0)
    with pytest.raises(ValueError, match="module name"):
        reverse_dependencies(imp, [])
