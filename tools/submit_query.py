"""spark-submit entry point for QUERYING an existing index — the
serving-side counterpart of submit_build.py, shipping the same way:

    spark-submit --master local[8] \
        --py-files dist/terrier_ef_spark.zip \
        tools/submit_query.py --index /path/to/efidx \
        --queries-file queries.tsv --k 10 --format trec

queries.tsv: one query per line, `qid<TAB>term term term` (the
classic topics shape). --format trec prints the standard 6-column run
format (`qid Q0 docno rank score tag`) resolving docids to docnos via
the docs table; --format json prints one JSON line. Terms are passed
through the index's recorded term pipeline (tokenizer/stopwords), so
raw query strings match what was indexed; repeated terms carry qtf
weights like Terrier's matching.

--ql parses each topic as the Terrier-style query language instead of a
bag of words: `term^w +require -prohibit "exact phrase" "a b"~N tab*
term~` (operators documented in query/parser.py), compiled onto the
same engine.

--sdm scores each topic with the Sequential Dependence Model
(query/sdm.py: unigram + ordered-bigram + unordered-window Dirichlet
features over the positional index); mutually exclusive with --ql.

--impact DIR serves through the two-stage cascade: the quantized
impact tier at DIR (tools/submit_build.py --impact-out, or
index/impact.py build_impact_index) answers the integer first pass,
and only its top --depth candidates are re-scored exactly
(query/cascade.py). Mutually exclusive with --ql/--sdm; qtf weights
do not apply (the tier has no weight channel).

--grep serves substring search (or regex search with --regex) from a
TRIGRAM index (query/substring.py build_trigram_index) instead of
ranked retrieval: --index points at the trigram index, --corpus at the
content source the candidates verify against (the driver documents
layout or any parquet in the input-hint shape with content + doc_id),
and each topic line is `qid<TAB>pattern` taken VERBATIM (no term
pipeline — substrings cross token boundaries by design). Substring
answers carry grep -c semantics (n_matches, first_pos); --regex
answers are the membership set. Per-topic hits cap at --max-hits by
ascending docid (a deterministic page — a hot trigram pattern on a big
corpus would otherwise collect unboundedly). Mutually exclusive with
--ql/--sdm/--significant/--impact. In --server mode the corpus
relation is pinned in the executor columnar cache next to the index
relations (the Zoekt memory-mapped-shards discipline; spills to disk
when it doesn't fit).

--symbols PATH points at a materialized symbols relation (parquet of
query/symbols.py extract_symbols: doc_id/kind/symbol/n_defs — write
it at build time with submit_build --symbols-out). Ranked retrieval
then adds --sym-beta per distinct query term the document DEFINES
(Zoekt's symbol ranking, exact pre-top-k via the engine's boost_pairs
channel; forces the exhaustive scorer — pruning bounds can't see the
addend). With --sym, topics are symbol NAMES (`qid<TAB>name`,
verbatim) answered by definition-count ranking instead of BM25
(--sym-prefix for name-prefix matching, --sym-kind to restrict the
definition family); output is always JSON rows.

--server keeps the session alive and answers topics from stdin
(`qid<TAB>query` per line, EOF ends); each topic's results are
followed by one blank line (the end-of-results frame) and flushed
immediately. The first query pays the per-index warm-up
(doclen broadcast, lexicon cache); every later query reuses it —
that's the warm serving latency bench.py's serving probe records.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_topic(idx, qid: int, text: str, mode: str,
                 ql: bool = False, sdm: bool = False) -> dict:
    if sdm:
        # Sequential Dependence Model (query/sdm.py): the ORDERED token
        # sequence feeds the bigram features, so no qtf dedup here;
        # adjacent duplicates (possible after the term pipeline, e.g.
        # "big big data") collapse to one occurrence — the unordered-
        # window feature is undefined for a repeated term and the
        # duplicate adds no adjacency evidence.
        from terrier_ef_spark.tokenizer import _tokenize_query_raw

        toks = _tokenize_query_raw(idx, text)
        terms = [t for i, t in enumerate(toks) if i == 0 or toks[i - 1] != t]
        if not terms:
            raise ValueError("no indexable terms after the term pipeline")
        return {"qid": qid, "terms": terms}
    if ql:
        # Terrier-style query language: operators compile onto the
        # engine in query/parser.py; the pipeline/qtf handling below is
        # subsumed by the parser's per-word resolution. Parse errors
        # surface here (before any Spark work) so --server can reject
        # a bad topic line without aborting the loop.
        from terrier_ef_spark.query.parser import parse_query

        parse_query(text)
        return {"qid": qid, "query": text}
    from terrier_ef_spark.tokenizer import tokenize_query_weighted

    # qtf weighting: repeated query terms aggregate with
    # weight = occurrence count, like Terrier's matching
    terms, weights = tokenize_query_weighted(idx, text)
    return {
        "qid": qid,
        "terms": terms,
        "weights": weights or None,
        "mode": mode,
    }


def _load_corpus(spark, path: str):
    """--corpus source: the driver documents layout (a dir holding
    documents.parquet) or any parquet already in the input-hint shape
    (needs content + doc_id)."""
    import os

    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "documents.parquet")
    ):
        from terrier_ef_spark.corpus import corpus_from_documents

        return corpus_from_documents(spark, path)
    df = spark.read.parquet(path)
    missing = {"content", "doc_id"} - set(df.columns)
    if missing:
        raise SystemExit(
            f"--corpus parquet lacks required columns: {sorted(missing)}"
        )
    return df


def _answer_grep(idx, corpus, batch, args, out, *,
                 terminator: bool = False) -> None:
    """batch = [(qid, pattern)]; one JSON array per batch. Substring
    rows: qid/docno/docid/n_matches/first_pos; --regex rows:
    qid/docno/docid membership."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from terrier_ef_spark.query.substring import (
        regex_search,
        substring_match_stats,
    )

    if args.regex:
        res = regex_search(idx, corpus, batch)
    else:
        res = substring_match_stats(idx, corpus, batch)
    w = Window.partitionBy("qid").orderBy("doc_id")
    res = (
        res.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= args.max_hits)
        .drop("_rn")
    )
    rows = (
        res.join(
            idx.docs.select(F.col("docid").alias("doc_id"), "docno"),
            "doc_id",
        )
        .orderBy("qid", "doc_id")
        .collect()
    )
    if args.regex:
        payload = [
            {"qid": r["qid"], "docno": r["docno"], "docid": r["doc_id"]}
            for r in rows
        ]
    else:
        payload = [
            {"qid": r["qid"], "docno": r["docno"], "docid": r["doc_id"],
             "n_matches": r["n_matches"], "first_pos": r["first_pos"]}
            for r in rows
        ]
    out.write(json.dumps(payload) + "\n")
    if terminator:
        out.write("\n")
    out.flush()


def _answer_sym(idx, sym, batch, args, out, *,
                terminator: bool = False) -> None:
    """batch = [(qid, name)]; one JSON array per batch of
    qid/rank/docno/docid/n_defs rows (definition-count ranking)."""
    from terrier_ef_spark.query.symbols import symbol_search

    res = symbol_search(
        sym,
        [{"qid": q, "name": n} for q, n in batch],
        k=args.k,
        prefix=args.sym_prefix,
        kind=args.sym_kind,
    )
    rows = (
        res.join(idx.docs.select("docid", "docno"), "docid")
        .orderBy("qid", "rank")
        .collect()
    )
    out.write(json.dumps([
        {"qid": r["qid"], "rank": r["rank"], "docno": r["docno"],
         "docid": r["docid"], "n_defs": r["n_defs"]}
        for r in rows
    ]) + "\n")
    if terminator:
        out.write("\n")
    out.flush()


def _answer_dep(idx, imp, batch, args, out, *,
                terminator: bool = False) -> None:
    """batch = [(qid, module)]; one JSON array per batch of
    qid/rank/module/docno/docid/n_refs rows — the reverse-dependency
    lookup (who imports this module), ranked (n_refs desc, docid
    asc). The literal module isin pushes into the (range-sorted)
    imports scan; an unknown module yields no rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = imp.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), str(m)) for q, m in batch], "qid long, module string"
    )
    mods = sorted({str(m) for _, m in batch})
    hits = (
        imp.where(F.col("module").isin(mods))
        .groupBy("module", "doc_id")
        .agg(F.sum("n_refs").cast("long").alias("n_refs"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("n_refs"), F.asc("doc_id"))
    res = (
        qdf.join(hits, "module")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= args.k)
    )
    rows = (
        res.join(
            idx.docs.select(F.col("docid").alias("doc_id"), "docno"),
            "doc_id",
        )
        .orderBy("qid", "rank")
        .collect()
    )
    out.write(json.dumps([
        {"qid": r["qid"], "rank": r["rank"], "module": r["module"],
         "docno": r["docno"], "docid": r["doc_id"],
         "n_refs": r["n_refs"]}
        for r in rows
    ]) + "\n")
    if terminator:
        out.write("\n")
    out.flush()


def _pick_algo(idx, algo: str) -> str:
    # a tombstoned (uncompacted) index refuses pruning algorithms;
    # serve it exhaustively until compaction (same rule as submit_build)
    if algo == "auto":
        return "bmw" if idx.deleted_docids() is None else "naive"
    return algo


DOCNO_CACHE_CAP = 200_000  # bounded docid->docno LRU for --server


def _resolve_docnos(idx, rows, cache: dict) -> list:
    """Attach docnos driver-side through a bounded cache; misses are
    fetched with one docid-isin scan (row-group pruned, and in-memory
    under the serving cache). Top documents repeat heavily across
    topics, so steady-state serving skips the per-topic join job."""
    from pyspark.sql import functions as F

    missing = sorted({int(r["docid"]) for r in rows} - cache.keys())
    if missing:
        fetched = (
            idx.docs.where(F.col("docid").isin(missing))
            .select("docid", "docno").collect()
        )
        for fr in fetched:
            cache[int(fr["docid"])] = fr["docno"]
        while len(cache) > DOCNO_CACHE_CAP:
            cache.pop(next(iter(cache)))
    return [
        {"qid": r["qid"], "rank": r["rank"], "docid": r["docid"],
         "docno": cache.get(int(r["docid"]), f"docid:{r['docid']}"),
         "score": r["score"]}
        for r in rows
    ]


def _answer(idx, batch, args, out, *, terminator: bool = False,
            docno_cache: dict | None = None) -> None:
    from terrier_ef_spark.query.engine import run_queries, with_docno

    if getattr(args, "significant", False):
        # related-concepts mining: the answer is a TERM list, not a
        # document ranking, so it always emits JSON rows (one array
        # per batch) — qid/term/fg_df/bg_df/score/rank
        from terrier_ef_spark.query.significant import significant_terms

        res = significant_terms(idx, batch, top_terms=args.k)
        out.write(json.dumps([
            {"qid": r["qid"], "rank": r["rank"], "term": r["term"],
             "fg_df": r["fg_df"], "bg_df": r["bg_df"],
             "score": round(r["score"], 6)}
            for r in res.orderBy("qid", "rank").collect()
        ]) + "\n")
        if terminator:
            out.write("\n")
        out.flush()
        return
    if getattr(args, "impact", None):
        from terrier_ef_spark.index.impact import ImpactIndex
        from terrier_ef_spark.query.cascade import run_queries_cascade

        imp = getattr(args, "_impact_idx", None)
        if imp is None:
            imp = ImpactIndex(idx.spark, args.impact)
            args._impact_idx = imp  # load once per process (--server)
        res = run_queries_cascade(
            imp, idx, batch, k=args.k, depth=args.depth,
            k1=args.k1, b=args.b,
        )
    elif getattr(args, "sdm", False):
        from terrier_ef_spark.query.sdm import run_queries_sdm

        res = run_queries_sdm(idx, batch, k=args.k)
    elif getattr(args, "ql", False):
        from terrier_ef_spark.query.parser import run_queries_ql

        # constrained topics force the exhaustive scorer inside; the
        # shared unconstrained batch honors the requested algo
        res = run_queries_ql(idx, batch, k=args.k,
                             algo=_pick_algo(idx, args.algo),
                             k1=args.k1, b=args.b)
    elif (getattr(args, "_sym_df", None) is not None
          or getattr(args, "_path_df", None) is not None):
        # boosted ranking (exhaustive scorer forced — BMW/MaxScore
        # bounds can't see additive boosts; run_queries would refuse):
        # --symbols alone = symbol boost; --paths alone = path boost
        # with the filename-only entry class; both = the composed
        # code ranking (channels pre-summed)
        from terrier_ef_spark.query.coderank import combine_boost_pairs
        from terrier_ef_spark.query.pathrank import path_term_pairs
        from terrier_ef_spark.query.symbols import symbol_boost_pairs

        channels, outer = [], False
        if getattr(args, "_sym_df", None) is not None:
            channels.append(
                symbol_boost_pairs(args._sym_df, batch,
                                   beta=args.sym_beta)
            )
        if getattr(args, "_path_df", None) is not None:
            channels.append(
                path_term_pairs(args._path_df, batch,
                                beta=args.path_beta)
            )
            outer = True  # filename-only docs enter the page
        bp = combine_boost_pairs(*channels)
        res = run_queries(idx, batch, k=args.k, algo="naive",
                          boost_pairs=bp, boost_unmatched=outer,
                          k1=args.k1, b=args.b)
    else:
        res = run_queries(idx, batch, k=args.k,
                          algo=_pick_algo(idx, args.algo),
                          k1=args.k1, b=args.b)
    if docno_cache is not None:
        rows = _resolve_docnos(
            idx, res.orderBy("qid", "rank").collect(), docno_cache
        )
    else:
        rows = with_docno(idx, res).orderBy("qid", "rank").collect()
    if args.format == "trec":
        for r in rows:
            out.write(
                f"{r['qid']} Q0 {r['docno']} {r['rank']} "
                f"{r['score']:.6f} {args.tag}\n"
            )
    else:
        out.write(json.dumps([
            {"qid": r["qid"], "rank": r["rank"], "docid": r["docid"],
             "docno": r["docno"], "score": round(r["score"], 6)}
            for r in rows
        ]) + "\n")
    if terminator:
        out.write("\n")  # end-of-results frame for --server clients
    out.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries-file", default=None,
                    help="TSV file: qid<TAB>query terms")
    ap.add_argument("--queries", nargs="*", default=[],
                    help="inline comma-joined terms per query")
    ap.add_argument("--server", action="store_true",
                    help="answer qid<TAB>query topics from stdin in a "
                    "loop against the cached index (warm serving)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--algo", default="auto",
                    choices=["auto", "naive", "bmw", "maxscore"])
    ap.add_argument("--mode", default="disjunctive",
                    choices=["disjunctive", "conjunctive"])
    ap.add_argument("--ql", action="store_true",
                    help="parse topics as Terrier-style query language "
                    "(+req -not term^w \"phrase\" \"a b\"~N tab* term~; "
                    "see query/parser.py) instead of bags of words")
    ap.add_argument("--sdm", action="store_true",
                    help="score topics with the Sequential Dependence "
                    "Model (unigram + ordered-bigram + unordered-window "
                    "Dirichlet features; needs a positional index)")
    ap.add_argument("--significant", action="store_true",
                    help="answer each topic with its significant terms "
                    "(JLH foreground/background lift over the match "
                    "set; needs a direct index) instead of documents; "
                    "output is always JSON rows")
    ap.add_argument("--grep", action="store_true",
                    help="serve substring search from a TRIGRAM index "
                    "(--index = build_trigram_index output); topics are "
                    "qid<TAB>pattern taken verbatim; needs --corpus; "
                    "output is always JSON rows")
    ap.add_argument("--regex", action="store_true",
                    help="with --grep: patterns are regexes "
                    "(trigram-filtered via required literals)")
    ap.add_argument("--corpus", default=None,
                    help="content source for --grep verification: the "
                    "driver documents dir or a parquet with "
                    "content + doc_id")
    ap.add_argument("--max-hits", type=int, default=1000,
                    help="per-topic --grep hit cap (ascending docid)")
    ap.add_argument("--symbols", default=None,
                    help="materialized symbols parquet (extract_symbols "
                    "output: doc_id/kind/symbol/n_defs; submit_build "
                    "--symbols-out). Ranked retrieval gains the "
                    "--sym-beta definition boost; required by --sym")
    ap.add_argument("--imports", default=None,
                    help="materialized import relation parquet "
                    "(doc_id, kind, module, n_refs — submit_build "
                    "--imports-out); required by --dep")
    ap.add_argument("--dep", action="store_true",
                    help="topics are verbatim MODULE names answered "
                    "by reverse-dependency lookup (who imports this) "
                    "from --imports instead of BM25; JSON rows")
    ap.add_argument("--sym", action="store_true",
                    help="topics are symbol NAMES (qid<TAB>name, "
                    "verbatim): answer with definition-count ranking "
                    "from --symbols instead of BM25; JSON rows")
    ap.add_argument("--sym-beta", type=float, default=1.0,
                    help="additive score per distinct query term the "
                    "document defines (with --symbols)")
    ap.add_argument("--paths", default=None,
                    help="path metadata source for filename-match "
                    "boosting (parquet with doc_id + path, or the "
                    "driver documents dir / input-hint parquet — the "
                    "path column is used): ranked retrieval adds "
                    "--path-beta per path-matched query term, and "
                    "path-only docs ENTER pages (the Zoekt "
                    "filename-only class); combined with --symbols "
                    "this is the composed code ranking")
    ap.add_argument("--path-beta", type=float, default=0.5,
                    help="additive score per path-matched query term "
                    "(with --paths)")
    ap.add_argument("--sym-prefix", action="store_true",
                    help="with --sym: match names by prefix")
    ap.add_argument("--sym-kind", default=None,
                    help="with --sym: restrict to one definition "
                    "family (function/class/method/value)")
    ap.add_argument("--k1", type=float, default=None)
    ap.add_argument("--b", type=float, default=None)
    ap.add_argument("--impact", default=None,
                    help="impact-index dir: serve through the two-stage "
                    "cascade (integer tier first pass, exact re-rank of "
                    "its top --depth candidates)")
    ap.add_argument("--depth", type=int, default=100,
                    help="cascade stage-1 candidate pool per query")
    ap.add_argument("--format", default="trec", choices=["trec", "json"])
    ap.add_argument("--tag", default="spark-ef")
    args = ap.parse_args()
    if args.sdm and args.ql:
        ap.error("--sdm and --ql are mutually exclusive")
    if args.impact and (args.sdm or args.ql):
        ap.error("--impact is mutually exclusive with --sdm/--ql")
    if args.significant and (args.sdm or args.ql or args.impact):
        ap.error("--significant is mutually exclusive with "
                 "--sdm/--ql/--impact")
    if args.grep and (args.sdm or args.ql or args.significant
                      or args.impact):
        ap.error("--grep is mutually exclusive with "
                 "--sdm/--ql/--significant/--impact")
    if args.grep and not args.corpus:
        ap.error("--grep needs --corpus (content verification source)")
    if args.regex and not args.grep:
        ap.error("--regex only applies with --grep")
    if args.sym and not args.symbols:
        ap.error("--sym needs --symbols (materialized symbols parquet)")
    if (args.symbols or args.paths) and (args.sdm or args.ql
                                         or args.significant
                                         or args.impact or args.grep):
        ap.error("--symbols/--sym/--paths are mutually exclusive with "
                 "--sdm/--ql/--significant/--impact/--grep (the boosts "
                 "ride the plain bag-of-words scorer)")
    if args.paths and args.sym:
        ap.error("--paths does not apply to --sym (symbol-name search "
                 "has no path channel)")
    if (args.sym_prefix or args.sym_kind) and not args.sym:
        ap.error("--sym-prefix/--sym-kind only apply with --sym")
    if args.dep and not args.imports:
        ap.error("--dep needs --imports (materialized import parquet)")
    if args.dep and (args.sym or args.grep or args.sdm or args.ql
                     or args.significant or args.impact or args.paths
                     or args.symbols):
        ap.error("--dep is mutually exclusive with the retrieval and "
                 "sym/grep modes (module-name lookup has no scorer)")

    from pyspark.sql import SparkSession

    from terrier_ef_spark.index.reader import open_index

    spark = SparkSession.builder.appName("ef-query").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    idx = open_index(spark, args.index)
    corpus = _load_corpus(spark, args.corpus) if args.grep else None
    sym_df = None
    if args.symbols:
        sym_df = spark.read.parquet(args.symbols)
        missing = {"doc_id", "kind", "symbol", "n_defs"} - set(sym_df.columns)
        if missing:
            raise SystemExit(
                f"--symbols parquet lacks columns: {sorted(missing)}"
            )
        args._sym_df = sym_df
    imp_df = None
    if args.imports:
        imp_df = spark.read.parquet(args.imports)
        missing = {"doc_id", "kind", "module", "n_refs"} \
            - set(imp_df.columns)
        if missing:
            raise SystemExit(
                f"--imports parquet lacks columns: {sorted(missing)}"
            )
    path_df = None
    if args.paths:
        import os as _os

        if _os.path.isdir(args.paths) and _os.path.exists(
            _os.path.join(args.paths, "documents.parquet")
        ):
            from terrier_ef_spark.corpus import corpus_from_documents

            path_df = corpus_from_documents(spark, args.paths)
        else:
            path_df = spark.read.parquet(args.paths)
        missing = {"doc_id", "path"} - set(path_df.columns)
        if missing:
            raise SystemExit(
                f"--paths source lacks columns: {sorted(missing)}"
            )
        path_df = path_df.select("doc_id", "path")
        args._path_df = path_df

    batch = []
    if args.queries_file:
        with open(args.queries_file) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                qid, _, text = line.partition("\t")
                if args.grep or args.sym or args.dep:
                    # verbatim topics: patterns / symbol / module
                    # names don't ride the term pipeline
                    batch.append((int(qid), text))
                    continue
                try:
                    batch.append(
                        _parse_topic(idx, int(qid), text, args.mode,
                                     ql=args.ql, sdm=args.sdm)
                    )
                except ValueError as exc:
                    # fail fast with the offending line, not a traceback
                    # (batch mode answers all-or-nothing; --server
                    # rejects per line instead)
                    ap.error(f"bad topic line {line!r}: {exc}")
    for i, q in enumerate(args.queries):
        if args.grep or args.sym or args.dep:
            # inline patterns / names stay verbatim — a substring may
            # legitimately contain a comma
            batch.append((10_000 + i, q))
        else:
            batch.append(
                _parse_topic(idx, 10_000 + i, q.replace(",", " "),
                             args.mode, ql=args.ql, sdm=args.sdm)
            )

    if batch:
        if args.grep:
            _answer_grep(idx, corpus, batch, args, sys.stdout)
        elif args.sym:
            _answer_sym(idx, sym_df, batch, args, sys.stdout)
        elif args.dep:
            _answer_dep(idx, imp_df, batch, args, sys.stdout)
        else:
            _answer(idx, batch, args, sys.stdout)
    elif not args.server:
        ap.error("no queries given (--queries-file, --queries, --server)")

    if args.server:
        # one topic per stdin line, answered immediately. Serving
        # session: pin the relations in Spark's in-memory cache (the
        # per-topic cost is otherwise parquet job overhead, not decode)
        # — plus the per-index doclen broadcast warmed by query one.
        idx.enable_serving_cache()
        if sym_df is not None:
            # pin the (definition-count-sized) symbols relation next
            # to the index relations for the serving lifetime
            sym_df = sym_df.persist()
            sym_df.count()
            args._sym_df = sym_df
        if path_df is not None:
            path_df = path_df.persist()
            path_df.count()
            args._path_df = path_df
        if imp_df is not None:
            # pin the import relation for the serving lifetime (the
            # sym_df discipline — import-statement-sized, not corpus)
            imp_df = imp_df.persist()
            imp_df.count()
        if args.grep:
            # pin content next to the index relations (the Zoekt
            # memory-mapped-shards discipline); Spark's columnar cache
            # spills to disk when the corpus outgrows executor memory
            corpus = corpus.persist()
            corpus.count()
        if args.impact:
            from terrier_ef_spark.index.impact import ImpactIndex

            args._impact_idx = ImpactIndex(idx.spark, args.impact)
            args._impact_idx.enable_serving_cache()
        docno_cache: dict = {}
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            qid, _, text = line.partition("\t")
            if args.grep:
                _answer_grep(idx, corpus, [(int(qid), text)], args,
                             sys.stdout, terminator=True)
                continue
            if args.sym:
                _answer_sym(idx, sym_df, [(int(qid), text)], args,
                            sys.stdout, terminator=True)
                continue
            if args.dep:
                _answer_dep(idx, imp_df, [(int(qid), text)], args,
                            sys.stdout, terminator=True)
                continue
            try:
                topic = _parse_topic(idx, int(qid), text, args.mode,
                                     ql=args.ql, sdm=args.sdm)
            except ValueError as exc:
                sys.stderr.write(f"bad topic line ({exc}): {line!r}\n")
                continue
            _answer(idx, [topic], args, sys.stdout, terminator=True,
                    docno_cache=docno_cache)

    spark.stop()


if __name__ == "__main__":
    main()
