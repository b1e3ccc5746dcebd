"""Symbol extraction + sym: search + symbol-boosted BM25
(query/symbols.py — the Zoekt ctags role).

Three independent formulations must agree on extraction (Spark Java
regex, DuckDB RE2, pure-Python re), and the boost path must be exactly
BM25 + beta x |defined query terms| on the full matched set — verified
by clean-room recompute, including a doc promoted INTO the top-k by
its definitions from outside the unboosted page."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.symbols import (
    SYMBOL_RULES,
    extract_symbols,
    run_queries_symbol_boost,
    symbol_boost_pairs,
    symbol_search,
    symbols_sql_duckdb,
)


@pytest.fixture(scope="module")
def sym_corpus(spark):
    return synthesize_corpus(spark, 300, seed=11, n_partitions=4).cache()


@pytest.fixture(scope="module")
def sym_pdf(sym_corpus):
    return extract_symbols(sym_corpus).toPandas()


def _py_oracle(cpdf: pd.DataFrame) -> pd.DataFrame:
    """Third formulation: stdlib re over the pandas rows."""
    rows = []
    for _, r in cpdf.iterrows():
        src = r["content"].lower()
        for kind, pattern, langs in SYMBOL_RULES:
            if langs is not None and r["lang"] not in langs:
                continue
            for m in re.finditer(pattern, src):
                rows.append((r["doc_id"], kind, m.group(1)))
    out = (
        pd.DataFrame(rows, columns=["doc_id", "kind", "symbol"])
        .groupby(["doc_id", "kind", "symbol"])
        .size()
        .rename("n_defs")
        .reset_index()
    )
    return out


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["n_defs"] = df["n_defs"].astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    return (
        df.sort_values(["doc_id", "kind", "symbol"]).reset_index(drop=True)
    )


def test_extraction_matches_duckdb_and_python(sym_corpus, sym_pdf):
    cpdf = sym_corpus.toPandas()
    con = duckdb.connect()
    con.register("corpus", cpdf)
    duck = con.execute(symbols_sql_duckdb("corpus")).df()
    assert len(sym_pdf) > 500  # non-trivial
    pd.testing.assert_frame_equal(_norm(sym_pdf), _norm(duck))
    pd.testing.assert_frame_equal(_norm(sym_pdf), _norm(_py_oracle(cpdf)))


def test_lang_gating(spark):
    df = spark.createDataFrame(
        [(1, "py", "val x def f"), (2, "scala", "val x def f"),
         (3, "md", "val x def f class c")],
        "doc_id long, lang string, content string",
    )
    got = {
        (r["doc_id"], r["kind"], r["symbol"])
        for r in extract_symbols(df).collect()
    }
    # 'val' fires only for scala; 'def' for py+scala; md gets nothing
    assert got == {
        (1, "function", "f"),
        (2, "function", "f"),
        (2, "value", "x"),
    }
    # lang_col=None disables gating: every rule applies to every row
    ungated = {
        (r["doc_id"], r["kind"], r["symbol"])
        for r in extract_symbols(df, lang_col=None).collect()
    }
    assert (1, "value", "x") in ungated and (3, "class", "c") in ungated


def test_case_fold(spark):
    df = spark.createDataFrame(
        [(1, "py", "DEF Alpha def beta")],
        "doc_id long, lang string, content string",
    )
    folded = {r["symbol"] for r in extract_symbols(df).collect()}
    assert folded == {"alpha", "beta"}
    raw = {
        r["symbol"]
        for r in extract_symbols(df, case_fold=False).collect()
    }
    assert raw == {"beta"}  # 'DEF Alpha' doesn't match unfolded


def test_symbol_search_exact_prefix_kind(spark, sym_pdf):
    sym = spark.createDataFrame(sym_pdf)
    # pick a name defined in several docs
    counts = sym_pdf.groupby("symbol")["doc_id"].nunique()
    name = counts[counts >= 3].index[0]
    res = symbol_search(sym, [{"qid": 1, "name": name}], k=5).toPandas()
    exp = (
        sym_pdf[sym_pdf.symbol == name]
        .groupby("doc_id")["n_defs"].sum().reset_index()
        .sort_values(["n_defs", "doc_id"], ascending=[False, True])
        .head(5).reset_index(drop=True)
    )
    assert list(res.sort_values("rank")["docid"]) == list(exp["doc_id"])
    assert list(res.sort_values("rank")["n_defs"]) == list(exp["n_defs"])
    # prefix mode is a superset driver: 'v1' covers v1, v10, v1xx...
    pre = symbol_search(
        sym, [{"qid": 1, "name": "v1"}], k=10, prefix=True
    ).toPandas()
    exp_pre = (
        sym_pdf[sym_pdf.symbol.str.startswith("v1")]
        .groupby("doc_id")["n_defs"].sum().reset_index()
        .sort_values(["n_defs", "doc_id"], ascending=[False, True])
        .head(10)
    )
    assert list(pre.sort_values("rank")["docid"]) == list(exp_pre["doc_id"])
    # kind filter restricts the family
    kf = symbol_search(
        sym, [{"qid": 1, "name": name}], k=5, kind="class"
    ).toPandas()
    exp_k = (
        sym_pdf[(sym_pdf.symbol == name) & (sym_pdf.kind == "class")]
        .groupby("doc_id")["n_defs"].sum().reset_index()
        .sort_values(["n_defs", "doc_id"], ascending=[False, True]).head(5)
    )
    assert list(kf.sort_values("rank")["docid"]) == list(exp_k["doc_id"])


def test_boost_pairs_distinct_per_term(spark):
    # 'parse' defined as BOTH function and class in doc 1 -> one unit
    sym = spark.createDataFrame(
        [(1, "function", "parse", 3), (1, "class", "parse", 2),
         (1, "function", "other", 1), (2, "function", "parse", 1)],
        "doc_id long, kind string, symbol string, n_defs long",
    )
    q = [{"qid": 7, "terms": ["parse", "missing"], "mode": "disjunctive"}]
    got = {
        (r["qid"], r["docid"]): r["boost"]
        for r in symbol_boost_pairs(sym, q, beta=0.5).collect()
    }
    assert got == {(7, 1): 0.5, (7, 2): 0.5}


@pytest.fixture(scope="module")
def sym_index(spark, sym_corpus, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    out = str(tmp_path_factory.mktemp("symidx") / "i")
    return build_index(spark, sym_corpus, out, n_partitions=4)


def test_symbol_boost_rank_identity(spark, sym_index, sym_corpus, sym_pdf):
    """score == unboosted BM25 + beta x |defined query terms|, on the
    FULL matched set — clean-room recompute from a deep unboosted run."""
    sym = spark.createDataFrame(sym_pdf)
    queries = [
        {"qid": 1, "terms": ["def", "import"], "mode": "disjunctive"},
        {"qid": 2, "terms": ["data", "result"], "mode": "disjunctive"},
    ]
    beta = 2.0
    k = 10
    deep = run_queries(
        sym_index, queries, k=10**6, strategy="term_major"
    ).toPandas()
    boosts = {}
    for q in queries:
        for t in set(q["terms"]):
            docs = set(sym_pdf[sym_pdf.symbol == t].doc_id)
            for d in docs:
                boosts[(q["qid"], d)] = boosts.get((q["qid"], d), 0) + beta
    deep["score"] = deep.apply(
        lambda r: r["score"] + boosts.get((r["qid"], r["docid"]), 0.0),
        axis=1,
    )
    expect = {
        qid: list(
            g.sort_values(["score", "docid"], ascending=[False, True])
            .head(k)[["docid", "score"]].itertuples(index=False, name=None)
        )
        for qid, g in deep.groupby("qid")
    }
    got = run_queries_symbol_boost(
        sym_index, sym, queries, k=k, beta=beta, strategy="term_major"
    ).toPandas()
    assert len(boosts) > 0  # boost actually fired
    for qid, exp in expect.items():
        g = got[got.qid == qid].sort_values("rank")
        assert list(g["docid"]) == [d for d, _ in exp]
        for s_got, (_, s_exp) in zip(g["score"], exp):
            assert abs(s_got - s_exp) < 1e-9
    # and the boost genuinely changed at least one page
    plain = run_queries(
        sym_index, queries, k=k, strategy="term_major"
    ).toPandas()
    diff = any(
        list(plain[plain.qid == q["qid"]].sort_values("rank")["docid"])
        != list(got[got.qid == q["qid"]].sort_values("rank")["docid"])
        for q in queries
    )
    assert diff, "fixture too weak: boost changed no ranking"


def test_boost_promotes_from_outside_page(spark, sym_index, sym_pdf):
    """A doc outside the unboosted top-k must enter under a large
    beta — proves the boost applies pre-truncation, not as a re-rank
    of the unboosted page."""
    sym = spark.createDataFrame(sym_pdf)
    q = [{"qid": 1, "terms": ["def"], "mode": "disjunctive"}]
    k = 5
    plain = run_queries(
        sym_index, q, k=10**6, strategy="term_major"
    ).toPandas().sort_values("rank")
    defining = set(sym_pdf[sym_pdf.symbol == "def"].doc_id)
    outside = [
        d for d in plain["docid"][k:] if d in defining
    ]
    assert outside, "fixture too weak: no defining doc outside top-k"
    got = run_queries_symbol_boost(
        sym_index, sym, q, k=k, beta=1000.0, strategy="term_major"
    ).toPandas()
    assert outside[0] in set(got["docid"])


def test_boost_pairs_refuses_pruning_paths(spark, sym_index, sym_pdf):
    sym = spark.createDataFrame(sym_pdf)
    q = [{"qid": 1, "terms": ["def"], "mode": "disjunctive"}]
    bp = symbol_boost_pairs(sym, q, beta=1.0)
    with pytest.raises(ValueError, match="boost_pairs"):
        run_queries(sym_index, q, algo="bmw", boost_pairs=bp)
    with pytest.raises(ValueError, match="boost_pairs"):
        run_queries(sym_index, q, strategy="query_major", boost_pairs=bp)


def test_extract_one_content_scan(sym_corpus):
    """Plan shape: one pass over content — no per-rule scan union, no
    shuffle before the count fold (exactly one Exchange)."""
    plan = extract_symbols(sym_corpus)._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchange <= 1, plan


def test_multi_language_rule_families(spark):
    """A kind may carry several per-language spellings; each fires
    only for its languages, and all three formulations still agree."""
    rows = [
        (1, "go", "func serve struct conn const retries interface stringer"),
        (2, "rs", "fn parse struct token trait walk enum state"),
        (3, "ts", "function render class app interface props const limit enum mode"),
        (4, "kt", "class widget val title interface clickable enum kind"),
        (5, "py", "def handle class base func notpy fn notpy"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, content string"
    )
    got = {
        (r["doc_id"], r["kind"], r["symbol"])
        for r in extract_symbols(df).collect()
    }
    assert got == {
        (1, "function", "serve"), (1, "struct", "conn"),
        (1, "const", "retries"), (1, "interface", "stringer"),
        (2, "function", "parse"), (2, "struct", "token"),
        (2, "trait", "walk"), (2, "enum", "state"),
        (3, "function", "render"), (3, "class", "app"),
        (3, "interface", "props"), (3, "const", "limit"),
        (3, "enum", "mode"),
        (4, "class", "widget"), (4, "value", "title"),
        (4, "interface", "clickable"), (4, "enum", "kind"),
        (5, "function", "handle"), (5, "class", "base"),
    }
    # twin agreement over the multi-language frame too
    cpdf = df.toPandas()
    con = duckdb.connect()
    con.register("mlsrc", cpdf)
    duck = con.execute(symbols_sql_duckdb("mlsrc")).df()
    assert {
        (r.doc_id, r.kind, r.symbol) for r in duck.itertuples()
    } == got
