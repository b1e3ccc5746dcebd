"""Ship-path test: the job must run end-to-end via
`spark-submit --py-files <zip>` with no package installed (north_rule:
'the whole job ships via spark-submit --py-files')."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    spark_home = os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
    spark_submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not available")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import make_zip

    zip_path = make_zip(str(tmp_path / "terrier_ef_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_build.py"),
            "--synth-docs", "60", "--out", str(tmp_path / "idx"),
            "--partitions", "4", "--block-bits", "5",
            "--delete-docids", "3", "7",
            "--compact-out", str(tmp_path / "idx_live"),
            "--export-prefix", str(tmp_path / "terrier_ef"),
            "--queries", "table,value", "merge",
        ],
        cwd=str(tmp_path),  # NOT the repo root: the package must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["num_docs"] == 60
    assert out["num_postings"] > 0
    # lifecycle verbs ran in the same submit: tombstone + compact
    assert out["tombstones"] == 2 and out["live_docs"] == 58
    assert out["results"], "query results missing"
    banned = {3, 7}
    assert not ({r["docid"] for r in out["results"]} & banned)
    # index artifacts landed with stage markers (resumability evidence)
    for stage in ("docs", "postings", "lexicon"):
        assert os.path.exists(tmp_path / "idx" / stage / "_SUCCESS")
    # Terrier-layout export rode the same submit (post-compact index)
    assert out["export_bits"]["docids"] > 0
    for ext in (".docids", ".freqs"):
        assert os.path.exists(str(tmp_path / "terrier_ef") + ext)


@pytest.mark.slow
def test_spark_submit_query_tool(tmp_path):
    """Serving-side ship path: build once, then answer queries from a
    separate spark-submit via tools/submit_query.py, TREC run output
    resolving docnos, raw query strings going through the index's
    recorded term pipeline."""
    spark_home = os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
    spark_submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not available")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import make_zip

    zip_path = make_zip(str(tmp_path / "terrier_ef_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    common = [spark_submit, "--master", "local[4]",
              "--conf", "spark.sql.shuffle.partitions=8",
              "--py-files", zip_path]
    build = subprocess.run(
        common + [os.path.join(REPO, "tools", "submit_build.py"),
                  "--synth-docs", "60", "--out", str(tmp_path / "idx"),
                  "--partitions", "4", "--block-bits", "5"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    qfile = tmp_path / "topics.tsv"
    # qid 3's term is absent from the corpus: it must yield no run
    # lines rather than an error (standard topics behavior)
    qfile.write_text("1\tTable, VALUE!\n2\tvalue\n3\tzzzmissing\n")
    query = subprocess.run(
        common + [os.path.join(REPO, "tools", "submit_query.py"),
                  "--index", str(tmp_path / "idx"),
                  "--queries-file", str(qfile), "--k", "5",
                  "--format", "trec", "--tag", "shiptest"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert query.returncode == 0, query.stderr[-2000:]
    lines = [ln.split() for ln in query.stdout.splitlines()
             if ln.endswith("shiptest")]
    assert lines, query.stdout[-1000:]
    by_qid: dict = {}
    for qid, q0, docno, rank, score, tag in lines:
        assert q0 == "Q0" and ":" in docno  # docno = repo:path@commit8
        by_qid.setdefault(qid, []).append((int(rank), float(score)))
    assert set(by_qid) == {"1", "2"}  # qid 3 (absent term) yields none
    for ranks in by_qid.values():
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        scores = [s for _, s in ranks]
        assert scores == sorted(scores, reverse=True)


def test_submit_query_server_mode(small_index):
    """--server answers stdin topics in a loop with an end-of-results
    frame per topic, reusing one session; results match a direct
    run_queries call with qtf weights, and the serving cache + docno
    LRU don't change values."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", small_index.paths.root, "--server", "--k", "5",
         "--format", "json"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    try:
        answers = []
        for topic in ("1\timport import zq", "2\tthe import", "3\timport"):
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    from terrier_ef_spark.query.engine import run_queries
    from terrier_ef_spark.tokenizer import tokenize_query_weighted

    for qid, text, got in zip(
        (1, 2, 3), ("import import zq", "the import", "import"), answers
    ):
        terms, weights = tokenize_query_weighted(small_index, text)
        want = run_queries(
            small_index,
            [{"qid": qid, "terms": terms, "weights": weights or None}],
            k=5, algo="bmw",
        ).orderBy("rank").collect()
        assert [(r["docid"], round(r["score"], 5)) for r in want] == [
            (g["docid"], round(g["score"], 5)) for g in got
        ]


def test_submit_query_server_ql_mode(small_index):
    """--server --ql parses stdin topics as the query language: one
    constrained topic (+require), one with a prohibition, one bad topic
    line (rejected without aborting the loop); values match a direct
    run_queries_ql call."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", small_index.paths.root, "--server", "--ql", "--k", "5",
         "--format", "json"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    topics = ("1\t+val def^2", "2\tdef import -val")
    try:
        answers = []
        # a malformed topic first: must be rejected, loop must survive
        p.stdin.write('9\t"unbalanced\n')
        p.stdin.flush()
        for topic in topics:
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    from terrier_ef_spark.query.parser import run_queries_ql

    for (qid, text), got in zip(((1, "+val def^2"), (2, "def import -val")),
                                answers):
        want = (
            run_queries_ql(small_index, [{"qid": qid, "query": text}], k=5)
            .orderBy("rank").collect()
        )
        assert [r["docid"] for r in want] == [g["docid"] for g in got]
        # the tool emits scores rounded to 6dp — compare with tolerance
        # (re-rounding a .5-boundary value would double-round)
        assert all(
            abs(r["score"] - g["score"]) < 2e-6
            for r, g in zip(want, got)
        )


def test_submit_query_server_sdm_mode(small_index):
    """--server --sdm scores stdin topics with the Sequential
    Dependence Model through the recorded term pipeline (ordered
    tokens, adjacent duplicates collapsed); values match a direct
    run_queries_sdm call."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", small_index.paths.root, "--server", "--sdm", "--k", "5",
         "--format", "json"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    topics = ("1\tval def", "2\timport import def")
    try:
        answers = []
        for topic in topics:
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    from terrier_ef_spark.query.sdm import run_queries_sdm
    from terrier_ef_spark.tokenizer import _tokenize_query_raw

    for (qid, text), got in zip(((1, "val def"), (2, "import import def")),
                                answers):
        toks = _tokenize_query_raw(small_index, text)
        terms = [t for i, t in enumerate(toks) if i == 0 or toks[i - 1] != t]
        want = (
            run_queries_sdm(small_index, [{"qid": qid, "terms": terms}], k=5)
            .orderBy("rank").collect()
        )
        assert [r["docid"] for r in want] == [g["docid"] for g in got]
        assert all(
            abs(r["score"] - g["score"]) < 2e-6
            for r, g in zip(want, got)
        )


def test_submit_query_server_significant_mode(small_index):
    """--server --significant answers stdin topics with JLH-ranked
    significant terms (JSON rows) instead of documents; values match a
    direct significant_terms call."""
    from terrier_ef_spark.index.direct import build_direct

    build_direct(small_index, n_partitions=2)  # resumable no-op if built
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", small_index.paths.root, "--server", "--significant",
         "--k", "5"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    topics = ("1\timport", "2\tval def")
    try:
        answers = []
        for topic in topics:
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    from terrier_ef_spark.query.significant import significant_terms
    from terrier_ef_spark.tokenizer import tokenize_query_weighted

    for (qid, text), got in zip(((1, "import"), (2, "val def")), answers):
        terms, _ = tokenize_query_weighted(small_index, text)
        want = (
            significant_terms(
                small_index, [{"qid": qid, "terms": terms}], top_terms=5
            ).orderBy("rank").collect()
        )
        assert [
            (r["term"], r["fg_df"], r["bg_df"], round(r["score"], 6))
            for r in want
        ] == [
            (g["term"], g["fg_df"], g["bg_df"], g["score"]) for g in got
        ]


@pytest.mark.slow
def test_spark_submit_impact_cascade(tmp_path):
    """Tier ship path: --impact-out derives the quantized tier in the
    build job; submit_query --impact serves through the cascade, and
    at depth >= corpus the run equals the plain exact run."""
    spark_home = os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
    spark_submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not available")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import make_zip

    zip_path = make_zip(str(tmp_path / "terrier_ef_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    common = [spark_submit, "--master", "local[4]",
              "--conf", "spark.sql.shuffle.partitions=8",
              "--py-files", zip_path]
    build = subprocess.run(
        common + [os.path.join(REPO, "tools", "submit_build.py"),
                  "--synth-docs", "60", "--out", str(tmp_path / "idx"),
                  "--partitions", "4", "--block-bits", "5",
                  "--impact-out", str(tmp_path / "imp")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert build.returncode == 0, build.stderr[-2000:]
    line = [ln for ln in build.stdout.splitlines() if ln.startswith("{")][-1]
    assert "impact_sec" in json.loads(line)

    qfile = tmp_path / "topics.tsv"
    qfile.write_text("1\ttable value\n2\tmerge\n")

    def _run(extra):
        p = subprocess.run(
            common + [os.path.join(REPO, "tools", "submit_query.py"),
                      "--index", str(tmp_path / "idx"),
                      "--queries-file", str(qfile), "--k", "5",
                      "--format", "trec", "--tag", "casc"] + extra,
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=600,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return [ln for ln in p.stdout.splitlines() if ln.endswith("casc")]

    cascade = _run(["--impact", str(tmp_path / "imp"), "--depth", "100"])
    exact = _run(["--algo", "naive"])
    assert cascade and cascade == exact


def test_submit_query_server_grep_mode(spark, tmp_path_factory):
    """--server --grep answers stdin patterns from a trigram index with
    grep -c rows (n_matches/first_pos, docno resolved); an absent
    pattern yields an empty array without killing the loop; batch-mode
    --regex returns the membership set. Values match direct
    substring_match_stats / regex_search calls."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.query.substring import build_trigram_index

    base = tmp_path_factory.mktemp("grep_ship")
    corpus = synthesize_corpus(spark, 60, seed=11, n_partitions=4)
    corpus.write.parquet(str(base / "corpus.parquet"))
    tri = build_trigram_index(
        spark, corpus, str(base / "tri"), n_partitions=4
    )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", str(base / "tri"), "--server", "--grep",
         "--corpus", str(base / "corpus.parquet")],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    topics = ("1\timport def", "2\tzzqx-not-present", "3\tthe")
    try:
        answers = []
        for topic in topics:
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    from terrier_ef_spark.query.substring import substring_match_stats

    assert answers[1] == []  # absent trigram: empty, loop survived
    for (qid, text), got in zip(
        ((1, "import def"), (3, "the")), (answers[0], answers[2])
    ):
        want = (
            substring_match_stats(tri, corpus, [(qid, text)])
            .orderBy("doc_id").collect()
        )
        assert [
            (r["qid"], r["doc_id"], r["n_matches"], r["first_pos"])
            for r in want
        ] == [
            (g["qid"], g["docid"], g["n_matches"], g["first_pos"])
            for g in got
        ]
        assert got, "trivially-empty comparison"
        assert all(":" in g["docno"] for g in got)

    # batch-mode --regex: membership set matches regex_search
    q = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", str(base / "tri"), "--grep", "--regex",
         "--corpus", str(base / "corpus.parquet"),
         "--queries", "import [a-z]+ def"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    got = json.loads(
        [ln for ln in q.stdout.splitlines() if ln.startswith("[")][-1]
    )
    from terrier_ef_spark.query.substring import regex_search

    want = (
        regex_search(tri, corpus, [(10_000, "import [a-z]+ def")])
        .orderBy("doc_id").collect()
    )
    assert [r["doc_id"] for r in want] == [g["docid"] for g in got]
    assert len(got) > 0


def test_submit_query_symbols_modes(spark, tmp_path_factory):
    """--sym serves definition-count ranking from a materialized
    symbols parquet over the warm --server loop (values match direct
    symbol_search; an undefined name yields an empty array without
    killing the loop), and --symbols adds the definition boost to
    batch ranked retrieval (values match run_queries_symbol_boost)."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.symbols import extract_symbols

    base = tmp_path_factory.mktemp("sym_ship")
    corpus = synthesize_corpus(spark, 80, seed=13, n_partitions=4)
    idx = build_index(spark, corpus, str(base / "idx"), n_partitions=4)
    sym = extract_symbols(corpus)
    sym.write.parquet(str(base / "symbols.parquet"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    tool = os.path.join(REPO, "tools", "submit_query.py")

    # --server --sym: names answered from the pinned symbols relation
    p = subprocess.Popen(
        [sys.executable, tool, "--index", str(base / "idx"),
         "--server", "--sym", "--symbols", str(base / "symbols.parquet")],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
    )
    # pick a name defined in several docs
    sym_pdf = sym.toPandas()
    counts = sym_pdf.groupby("symbol")["doc_id"].nunique()
    name = counts[counts >= 2].index[0]
    topics = (f"1\t{name}", "2\tzz_undefined_name")
    try:
        answers = []
        for topic in topics:
            p.stdin.write(topic + "\n")
            p.stdin.flush()
            block = []
            while True:
                line = p.stdout.readline()
                if line == "" or line == "\n":
                    break
                block.append(line)
            assert len(block) == 1, block
            answers.append(json.loads(block[0]))
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    assert answers[1] == []  # undefined name: empty, loop survived
    from terrier_ef_spark.query.symbols import symbol_search

    want = (
        symbol_search(sym, [{"qid": 1, "name": name}], k=10)
        .orderBy("rank").collect()
    )
    assert want, "trivially-empty comparison"
    assert [(r["rank"], r["docid"], r["n_defs"]) for r in want] == [
        (g["rank"], g["docid"], g["n_defs"]) for g in answers[0]
    ]

    # batch --symbols boost: ranked retrieval == run_queries_symbol_boost
    q = subprocess.run(
        [sys.executable, tool, "--index", str(base / "idx"),
         "--symbols", str(base / "symbols.parquet"),
         "--sym-beta", "3.0", "--format", "json",
         "--queries", "def,import"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    got = json.loads(
        [ln for ln in q.stdout.splitlines() if ln.startswith("[")][-1]
    )
    from terrier_ef_spark.query.symbols import run_queries_symbol_boost

    want = run_queries_symbol_boost(
        idx, sym,
        [{"qid": 10_000, "terms": ["def", "import"],
          "mode": "disjunctive"}],
        k=10, beta=3.0,
    ).orderBy("rank").collect()
    assert [r["docid"] for r in want] == [g["docid"] for g in got]
    for r, g in zip(want, got):
        assert abs(r["score"] - g["score"]) < 1e-5
    # the boost path genuinely differs from plain BM25 here
    from terrier_ef_spark.query.engine import run_queries

    plain = run_queries(
        idx, [{"qid": 10_000, "terms": ["def", "import"],
               "mode": "disjunctive"}], k=10, strategy="term_major",
    ).orderBy("rank").collect()
    assert [r["docid"] for r in plain] != [g["docid"] for g in got]


def test_submit_build_symbols_out(spark, tmp_path_factory):
    """--symbols-out materializes the extraction relation at build
    time; rows equal a direct extract_symbols over the same corpus,
    and --compact-out is refused (docid re-densification would
    misalign the relation)."""
    base = tmp_path_factory.mktemp("symbuild")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    tool = os.path.join(REPO, "tools", "submit_build.py")
    p = subprocess.run(
        [sys.executable, tool, "--synth-docs", "40", "--seed", "9",
         "--out", str(base / "idx"), "--partitions", "4",
         "--symbols-out", str(base / "symbols.parquet")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["symbols_rows"] > 0

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.query.symbols import extract_symbols

    want = (
        extract_symbols(synthesize_corpus(spark, 40, seed=9, n_partitions=4))
        .orderBy("doc_id", "kind", "symbol").collect()
    )
    got = (
        spark.read.parquet(str(base / "symbols.parquet"))
        .orderBy("doc_id", "kind", "symbol").collect()
    )
    assert len(got) == out["symbols_rows"]
    assert [tuple(r) for r in want] == [tuple(r) for r in got]

    refuse = subprocess.run(
        [sys.executable, tool, "--synth-docs", "10",
         "--out", str(base / "idx2"), "--partitions", "2",
         "--delete-docids", "1",
         "--compact-out", str(base / "idx2_live"),
         "--symbols-out", str(base / "s2.parquet")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert refuse.returncode != 0
    assert "re-densifies docids" in refuse.stderr


def test_submit_query_code_rank(spark, tmp_path_factory):
    """--symbols + --paths together serve the composed code ranking:
    batch JSON rows value-match run_queries_code_rank, including a
    filename-only doc entering through the path channel."""
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.symbols import extract_symbols
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("coderank_ship")
    corpus = synthesize_corpus(spark, 80, seed=29, n_partitions=4)
    idx = build_index(spark, corpus, str(base / "idx"), n_partitions=4)
    sym = extract_symbols(corpus)
    sym.write.parquet(str(base / "symbols.parquet"))
    d = F.col("doc_id")
    meta = corpus.select(
        "doc_id",
        F.concat(
            F.lit("lib/"),
            F.when(d % 2 == 0, "import").otherwise("zzqpathword"),
            F.lit("/m"), d.cast("string"), F.lit(".py"),
        ).alias("path"),
    )
    meta.write.parquet(str(base / "paths.parquet"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    q = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", str(base / "idx"),
         "--symbols", str(base / "symbols.parquet"),
         "--paths", str(base / "paths.parquet"),
         "--sym-beta", "2.0", "--path-beta", "1.0",
         "--format", "json", "--queries", "def,zzqpathword"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    got = json.loads(
        [ln for ln in q.stdout.splitlines() if ln.startswith("[")][-1]
    )
    from terrier_ef_spark.query.coderank import run_queries_code_rank

    want = run_queries_code_rank(
        idx, sym, meta,
        [{"qid": 10_000, "terms": ["def", "zzqpathword"],
          "mode": "disjunctive"}],
        k=10, sym_beta=2.0, path_beta=1.0,
    ).orderBy("rank").collect()
    assert [r["docid"] for r in want] == [g["docid"] for g in got]
    for r, g in zip(want, got):
        assert abs(r["score"] - g["score"]) < 1e-5
    # zzqpathword is path-only: at least one returned doc entered
    # through the filename channel (score includes the 1.0 path unit)
    assert got, "empty page"


def test_submit_build_snapshot_latest(spark, tmp_path_factory):
    """--snapshot-latest indexes one version per (repo, path) from a
    full-history input; with --symbols-out the relation stays aligned
    with the re-assigned dense docids."""
    from pyspark.sql import functions as F
    from terrier_ef_spark.corpus import synthesize_corpus

    base = tmp_path_factory.mktemp("snapbuild")
    # fold 90 docs into 15 (repo, path) groups of ~6 versions
    hist = synthesize_corpus(spark, 90, seed=31, n_partitions=4).withColumn(
        "path", F.concat(F.lit("p"), (F.col("doc_id") % 15).cast("string"))
    )
    hist.write.parquet(str(base / "history.parquet"))
    n_groups = hist.select("repo", "path").distinct().count()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_build.py"),
         "--input", str(base / "history.parquet"),
         "--snapshot-latest", "--out", str(base / "idx"),
         "--partitions", "4",
         "--symbols-out", str(base / "symbols.parquet"),
         "--queries", "table,value"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    out = json.loads(
        [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert out["num_docs"] == n_groups
    assert out["results"], "snapshot index answers queries"

    # symbols alignment: every symbol doc_id is a valid dense docid,
    # and spot-check one doc's symbols against its indexed content via
    # the docs table's sha256 (the content the winner carried)
    from terrier_ef_spark.index.reader import open_index
    from terrier_ef_spark.query.symbols import extract_symbols
    from terrier_ef_spark.corpus import snapshot_latest

    sym = spark.read.parquet(str(base / "symbols.parquet"))
    assert 0 < sym.count()
    assert sym.agg(F.max("doc_id")).collect()[0][0] < n_groups
    idx = open_index(spark, str(base / "idx"))
    winners = snapshot_latest(hist, order_cols=("commit", "doc_id"))
    joined = (
        idx.docs.select("docid", "sha256")
        .join(
            winners.select(
                F.sha2(F.col("content"), 256).alias("sha256"), "lang",
                "content",
            ),
            "sha256",
        )
    )
    assert joined.count() == n_groups  # every indexed doc IS a winner
    direct = extract_symbols(
        joined.select(F.col("docid").alias("doc_id"), "lang", "content")
    )
    got = {(r["doc_id"], r["kind"], r["symbol"], r["n_defs"])
           for r in sym.collect()}
    want = {(r["doc_id"], r["kind"], r["symbol"], r["n_defs"])
            for r in direct.collect()}
    assert got == want and got


def test_submit_build_clones_out(spark, tmp_path_factory):
    """--clones-out materializes the winnowing fingerprint + clone
    pair relations at build time; both value-match direct
    pipeline/winnow.py calls over the same corpus, and --compact-out
    is refused (docid re-densification would misalign them)."""
    base = tmp_path_factory.mktemp("clonebuild")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    tool = os.path.join(REPO, "tools", "submit_build.py")
    p = subprocess.run(
        [sys.executable, tool, "--synth-docs", "40", "--seed", "9",
         "--out", str(base / "idx"), "--partitions", "4",
         "--clones-out", str(base / "clones"),
         "--clone-min-shared", "5"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["clone_fingerprints"] > 0

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.pipeline.winnow import (
        winnow_clone_pairs,
        winnow_fingerprints,
    )

    corpus = synthesize_corpus(spark, 40, seed=9, n_partitions=4)
    want_fp = (
        winnow_fingerprints(corpus, k=8, w=4, text_col="content")
        .orderBy("doc_id", "pos", "fp").collect()
    )
    got_fp = (
        spark.read.parquet(str(base / "clones" / "fingerprints"))
        .orderBy("doc_id", "pos", "fp").collect()
    )
    assert len(got_fp) == out["clone_fingerprints"]
    assert [tuple(r) for r in want_fp] == [tuple(r) for r in got_fp]

    want_pairs = (
        winnow_clone_pairs(
            winnow_fingerprints(corpus, k=8, w=4, text_col="content"),
            min_shared=5,
        ).orderBy("doc_a", "doc_b").collect()
    )
    got_pairs = (
        spark.read.parquet(str(base / "clones" / "pairs"))
        .orderBy("doc_a", "doc_b").collect()
    )
    assert len(got_pairs) == out["clone_pairs"] > 0
    assert [tuple(r) for r in want_pairs] == [tuple(r) for r in got_pairs]

    refuse = subprocess.run(
        [sys.executable, tool, "--synth-docs", "10",
         "--out", str(base / "idx2"), "--partitions", "2",
         "--delete-docids", "1",
         "--compact-out", str(base / "idx2_live"),
         "--clones-out", str(base / "c2")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert refuse.returncode != 0
    assert "re-densifies docids" in refuse.stderr


def test_submit_build_imports_out_and_dep_query(spark, tmp_path_factory):
    """--imports-out materializes the import relation at build time;
    submit_query --imports/--dep answers verbatim module names with
    reverse-dependency rows matching a direct computation, and an
    unknown module yields an empty array."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.corpus import synthesize_corpus

    base = tmp_path_factory.mktemp("impship")
    corp = (
        synthesize_corpus(spark, 30, seed=13, n_partitions=4)
        .withColumn("lang", F.lit("py"))
        .withColumn(
            "content",
            F.concat(F.lit("import dep_mod"),
                     (F.col("doc_id") % 3).cast("string"),
                     F.lit("\n"), F.col("content")),
        )
    )
    corp.write.parquet(str(base / "corp.parquet"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_build.py"),
         "--input", str(base / "corp.parquet"),
         "--out", str(base / "idx"), "--partitions", "4",
         "--imports-out", str(base / "imports.parquet")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    out = json.loads(
        [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    )

    from terrier_ef_spark.query.imports import extract_imports

    want = extract_imports(corp).toPandas()
    assert out["imports_rows"] == len(want)

    q = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", str(base / "idx"),
         "--imports", str(base / "imports.parquet"), "--dep",
         "--k", "5", "--queries", "dep_mod1", "zz_absent"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert q.returncode == 0, q.stderr[-3000:]
    rows = json.loads(
        [ln for ln in q.stdout.splitlines() if ln.startswith("[")][-1]
    )
    # dep_mod1 importers are doc_id % 3 == 1, n_refs 1 each, ranked
    # by docid asc, cut at k=5; the absent module contributes nothing
    got = [(r["qid"], r["rank"], r["docid"], r["n_refs"]) for r in rows]
    assert got == [(10_000, i + 1, 1 + 3 * i, 1) for i in range(5)]
    assert all(r["module"] == "dep_mod1" for r in rows)

    refuse = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_query.py"),
         "--index", str(base / "idx"), "--dep", "--queries", "x"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert refuse.returncode != 0
    assert "--dep needs --imports" in refuse.stderr


def test_submit_build_clones_poly_hash(spark, tmp_path_factory):
    """--clone-hash poly ships the vectorized fast path: the
    materialized fingerprints match a direct poly-mode call (16-hex
    values, never md5-shaped)."""
    base = tmp_path_factory.mktemp("clonepoly")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_build.py"),
         "--synth-docs", "25", "--seed", "3",
         "--out", str(base / "idx"), "--partitions", "4",
         "--clones-out", str(base / "clones"),
         "--clone-hash", "poly", "--clone-min-shared", "5"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.pipeline.winnow import winnow_fingerprints

    corpus = synthesize_corpus(spark, 25, seed=3, n_partitions=4)
    want = (
        winnow_fingerprints(corpus, k=8, w=4, text_col="content",
                            hash_fn="poly")
        .orderBy("doc_id", "pos", "fp").collect()
    )
    got = (
        spark.read.parquet(str(base / "clones" / "fingerprints"))
        .orderBy("doc_id", "pos", "fp").collect()
    )
    assert [tuple(r) for r in want] == [tuple(r) for r in got]
    assert all(len(r["fp"]) == 16 for r in got)
