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
raw query strings match what was indexed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries-file", default=None,
                    help="TSV file: qid<TAB>query terms")
    ap.add_argument("--queries", nargs="*", default=[],
                    help="inline comma-joined terms per query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--algo", default="auto",
                    choices=["auto", "naive", "bmw", "maxscore"])
    ap.add_argument("--mode", default="disjunctive",
                    choices=["disjunctive", "conjunctive"])
    ap.add_argument("--k1", type=float, default=None)
    ap.add_argument("--b", type=float, default=None)
    ap.add_argument("--format", default="trec", choices=["trec", "json"])
    ap.add_argument("--tag", default="spark-ef")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from terrier_ef_spark.index.reader import open_index
    from terrier_ef_spark.query.engine import run_queries, with_docno
    from terrier_ef_spark.tokenizer import tokenize_query_weighted

    spark = SparkSession.builder.appName("ef-query").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    idx = open_index(spark, args.index)

    batch = []
    if args.queries_file:
        with open(args.queries_file) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                qid, _, text = line.partition("\t")
                # qtf weighting: repeated query terms aggregate with
                # weight = occurrence count, like Terrier's matching
                terms, weights = tokenize_query_weighted(idx, text)
                batch.append({
                    "qid": int(qid),
                    "terms": terms,
                    "weights": weights or None,
                    "mode": args.mode,
                })
    for i, q in enumerate(args.queries):
        terms, weights = tokenize_query_weighted(idx, q.replace(",", " "))
        batch.append({
            "qid": 10_000 + i,
            "terms": terms,
            "weights": weights or None,
            "mode": args.mode,
        })
    if not batch:
        ap.error("no queries given (--queries-file or --queries)")

    # a tombstoned (uncompacted) index refuses pruning algorithms;
    # serve it exhaustively until compaction (same rule as submit_build)
    algo = args.algo
    if algo == "auto":
        algo = "bmw" if idx.deleted_docids() is None else "naive"
    res = run_queries(idx, batch, k=args.k, algo=algo,
                      k1=args.k1, b=args.b)
    rows = with_docno(idx, res).orderBy("qid", "rank").collect()

    if args.format == "trec":
        for r in rows:
            sys.stdout.write(
                f"{r['qid']} Q0 {r['docno']} {r['rank']} "
                f"{r['score']:.6f} {args.tag}\n"
            )
    else:
        print(json.dumps([
            {"qid": r["qid"], "rank": r["rank"], "docid": r["docid"],
             "docno": r["docno"], "score": round(r["score"], 6)}
            for r in rows
        ]))
    spark.stop()


if __name__ == "__main__":
    main()
