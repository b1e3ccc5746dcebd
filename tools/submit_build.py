"""spark-submit entry point for the index build + query job.

The north-rule ship path: the package rides --py-files as a zip, so the
job needs no installed package on the executors:

    python tools/make_pyfiles.py                      # -> dist/terrier_ef_spark.zip
    spark-submit --master local[8] \
        --py-files dist/terrier_ef_spark.zip \
        tools/submit_build.py --synth-docs 5000 --out /tmp/efidx \
        --queries table,value spark,merge

On a real cluster the same invocation takes --master yarn/k8s and the
input switches from --synth-docs to --input <parquet/iceberg path> with
columns (repo, path, commit, lang, content). Prints one JSON line with
build stats (postings/sec, bits/posting) and per-query top-k results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with input_hint columns")
    ap.add_argument("--synth-docs", type=int, default=0,
                    help="synthesize a deterministic corpus of N docs instead")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--log2-quantum", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=None)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--tokenizer", default="simple",
                    choices=["simple", "code", "terrier"])
    ap.add_argument("--stopwords", nargs="*", default=None,
                    help="terms removed by the term pipeline")
    ap.add_argument("--max-term-length", type=int, default=None)
    ap.add_argument("--k1", type=float, default=None,
                    help="BM25 k1 recorded in the index (query default)")
    ap.add_argument("--b", type=float, default=None,
                    help="BM25 b recorded in the index (query default)")
    ap.add_argument("--direct", action="store_true",
                    help="also build the forward (direct) index")
    ap.add_argument("--verify", action="store_true",
                    help="run the integrity fsck (index/verify.py) on "
                    "the final index; non-zero exit if it fails")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--delete-docids", nargs="*", type=int, default=None,
                    help="tombstone these docids after the build")
    ap.add_argument("--compact-out", default=None,
                    help="compact tombstones into a new index at this dir")
    ap.add_argument("--merge-with", nargs="*", default=None,
                    help="existing index dirs to N-way-merge with the "
                         "built index; result replaces the query target")
    ap.add_argument("--merge-out", default=None,
                    help="output dir for --merge-with (required with it)")
    ap.add_argument("--impact-out", default=None,
                    help="also derive the quantized impact serving tier "
                    "here (index/impact.py; serve via submit_query "
                    "--impact)")
    ap.add_argument("--impact-bits", type=int, default=8)
    ap.add_argument("--snapshot-latest", action="store_true",
                    help="pre-select one version per (repo, path) from a "
                    "full-history input (corpus.snapshot_latest: groupBy "
                    "+ max_by with map-side partial agg) before indexing; "
                    "doc_ids are re-assigned densely over the winners")
    ap.add_argument("--snapshot-order", nargs="*", default=["commit"],
                    help="columns whose tuple orders versions (greatest "
                    "wins; doc_id is appended as tiebreak when present — "
                    "otherwise make this a total order per file)")
    ap.add_argument("--symbols-out", default=None,
                    help="also extract the per-language symbol-definition "
                    "relation from the corpus (query/symbols.py) and "
                    "write it as parquet here (serve via submit_query "
                    "--symbols/--sym)")
    ap.add_argument("--imports-out", default=None,
                    help="also extract the per-language import/"
                    "dependency relation (query/imports.py) and write "
                    "it as parquet here (serve via submit_query "
                    "--imports/--dep)")
    ap.add_argument("--clones-out", default=None,
                    help="also run MOSS winnowing over the corpus "
                    "(pipeline/winnow.py) and write DIR/fingerprints "
                    "+ DIR/pairs parquet — the clone/duplication "
                    "receipt of a training-data build")
    ap.add_argument("--clone-k", type=int, default=8,
                    help="winnowing k-gram length")
    ap.add_argument("--clone-w", type=int, default=4,
                    help="winnowing window (guarantee length k+w-1)")
    ap.add_argument("--clone-min-shared", type=int, default=8,
                    help="min shared fingerprints per clone pair")
    ap.add_argument("--clone-max-bucket", type=int, default=200,
                    help="exclude fingerprints shared by more docs "
                    "than this before the pair self-join")
    ap.add_argument("--clone-hash", choices=("md5", "poly"),
                    default="md5",
                    help="fingerprint hash: md5 = cross-engine "
                    "verifiable (DuckDB twin), poly = vectorized "
                    "fast path for corpus-scale runs (modes never "
                    "match each other's artifacts)")
    ap.add_argument("--export-prefix", default=None,
                    help="also export the final index to the reference's "
                         "Terrier-layout bitfiles at this path prefix")
    ap.add_argument("--queries", nargs="*", default=[],
                    help="comma-joined terms per query, e.g. 'a,b' 'c'")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    if (args.symbols_out or args.clones_out or args.imports_out) \
            and args.compact_out:
        # these relations are keyed by the build corpus's doc_id
        # == the built index's docid (dense aligned ids); compaction
        # RE-densifies docids, which would silently misalign them
        which = ("--symbols-out" if args.symbols_out
                 else "--clones-out" if args.clones_out
                 else "--imports-out")
        ap.error(f"{which} with --compact-out: compaction "
                 "re-densifies docids, misaligning the doc_id-keyed "
                 "relation — derive it from the compacted corpus "
                 "separately")

    # SparkSession comes from spark-submit (master/conf set there); the
    # imports resolve from the --py-files zip on driver and executors.
    from pyspark.sql import SparkSession

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.query.engine import run_queries

    spark = SparkSession.builder.appName("ef-index-build").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    if args.synth_docs:
        corpus = synthesize_corpus(spark, args.synth_docs, seed=args.seed,
                                   n_partitions=args.partitions)
    elif args.input:
        corpus = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synth-docs is required")

    if args.snapshot_latest:
        from terrier_ef_spark.corpus import snapshot_latest

        order = tuple(args.snapshot_order)
        if "doc_id" in corpus.columns and "doc_id" not in order:
            order = order + ("doc_id",)  # deterministic tie-break
        # drop any source doc_id so dense ids are re-assigned over the
        # surviving snapshot (the builder's 0..n-1 invariant)
        corpus = snapshot_latest(corpus, order_cols=order)
        if "doc_id" in corpus.columns:
            corpus = corpus.drop("doc_id")
        if args.symbols_out or args.clones_out or args.imports_out:
            # materialize the ids the builder would assign (same
            # helper, same (repo, path, commit) order) so the
            # doc_id-keyed relations stay aligned with the built index
            from terrier_ef_spark.index.ids import assign_dense_ids

            corpus = assign_dense_ids(
                corpus, ["repo", "path", "commit"], "doc_id",
                args.partitions,
            )

    t0 = time.time()
    idx = build_index(
        spark, corpus, args.out,
        log2_quantum=args.log2_quantum,
        positions=args.positions,
        block_bits=args.block_bits,
        n_partitions=args.partitions,
        tokenizer=args.tokenizer,
        stopwords=args.stopwords,
        max_term_length=args.max_term_length,
        resume=not args.no_resume,
        **{k: v for k, v in (("k1", args.k1), ("b", args.b))
           if v is not None},
    )
    build_sec = time.time() - t0

    out = {
        "build_sec": round(build_sec, 3),
        "num_docs": idx.stats["num_docs"],
        "num_postings": idx.stats["num_postings"],
        "postings_per_sec": round(idx.stats["num_postings"] / build_sec),
        "bits_per_posting": round(idx.stats["bits_per_posting"], 3),
    }

    if args.direct:
        from terrier_ef_spark.index.direct import build_direct

        t0 = time.time()
        direct = build_direct(idx, n_partitions=args.partitions,
                              resume=not args.no_resume)
        out["direct_sec"] = round(time.time() - t0, 3)
        out["direct_docs"] = direct.count()

    if args.merge_with:
        if not args.merge_out:
            ap.error("--merge-with requires --merge-out")
        from terrier_ef_spark.index.merge import merge_many

        t0 = time.time()
        idx = merge_many(spark, [args.out, *args.merge_with],
                         args.merge_out, n_partitions=args.partitions)
        out["merge_sec"] = round(time.time() - t0, 3)
        out["merged_docs"] = idx.stats["num_docs"]

    if args.delete_docids:
        from terrier_ef_spark.index.maintenance import delete_docs

        out["tombstones"] = delete_docs(idx, args.delete_docids)

    # compaction runs whenever requested — including against tombstones
    # left by a PRIOR run, not only ones created by this invocation
    if args.compact_out:
        from terrier_ef_spark.index.maintenance import compact_index

        if idx.deleted_docids() is None:
            ap.error("--compact-out: index has no tombstones to compact "
                     "(use --delete-docids or point at a tombstoned index)")
        t0 = time.time()
        idx = compact_index(idx, args.compact_out,
                            n_partitions=args.partitions)
        out["compact_sec"] = round(time.time() - t0, 3)
        out["live_docs"] = idx.stats["num_docs"]

    if args.symbols_out:
        from terrier_ef_spark.query.symbols import extract_symbols

        t0 = time.time()
        sym = extract_symbols(corpus)
        # range-sort by symbol: sym: name lookups and the boost
        # channel's term isin then prune row-groups via parquet
        # min/max stats instead of scanning the whole relation
        (sym.repartitionByRange(args.partitions, "symbol")
            .sortWithinPartitions("symbol")
            .write.mode("overwrite").parquet(args.symbols_out))
        out["symbols_sec"] = round(time.time() - t0, 3)
        out["symbols_rows"] = spark.read.parquet(args.symbols_out).count()

    if args.imports_out:
        from terrier_ef_spark.query.imports import extract_imports

        t0 = time.time()
        imp = extract_imports(corpus)
        # range-sort by module: --dep lookups and reverse-dependency
        # scans prune parquet row-groups via min/max stats (the
        # symbols-artifact discipline)
        (imp.repartitionByRange(args.partitions, "module")
            .sortWithinPartitions("module")
            .write.mode("overwrite").parquet(args.imports_out))
        out["imports_sec"] = round(time.time() - t0, 3)
        out["imports_rows"] = spark.read.parquet(args.imports_out).count()

    if args.clones_out:
        from terrier_ef_spark.pipeline.winnow import (
            winnow_clone_pairs,
            winnow_fingerprints,
        )

        t0 = time.time()
        tc = "content" if "content" in corpus.columns else "text"
        fps_dir = os.path.join(args.clones_out, "fingerprints")
        pairs_dir = os.path.join(args.clones_out, "pairs")
        (winnow_fingerprints(corpus, k=args.clone_k, w=args.clone_w,
                             text_col=tc, hash_fn=args.clone_hash)
         .write.mode("overwrite").parquet(fps_dir))
        fps = spark.read.parquet(fps_dir)  # pairs re-read, not re-hash
        (winnow_clone_pairs(fps, min_shared=args.clone_min_shared,
                            max_bucket=args.clone_max_bucket)
         .write.mode("overwrite").parquet(pairs_dir))
        out["clones_sec"] = round(time.time() - t0, 3)
        out["clone_fingerprints"] = fps.count()
        out["clone_pairs"] = spark.read.parquet(pairs_dir).count()

    if args.impact_out:
        from terrier_ef_spark.index.impact import build_impact_index

        t0 = time.time()
        imp = build_impact_index(idx, args.impact_out,
                                 bits=args.impact_bits,
                                 n_partitions=args.partitions)
        out["impact_sec"] = round(time.time() - t0, 3)
        out["impact_gmax"] = imp.stats["impact_gmax"]

    if args.export_prefix:
        from terrier_ef_spark.index.export import export_terrier_bitfiles

        t0 = time.time()
        eprops = export_terrier_bitfiles(idx, args.export_prefix)
        out["export_sec"] = round(time.time() - t0, 3)
        out["export_bits"] = {
            "docids": eprops["docids_bits"], "freqs": eprops["freqs_bits"],
            "positions": eprops.get("positions_bits", 0),
        }

    if args.queries:
        batch = [
            {"qid": i + 1, "terms": q.split(","), "mode": "disjunctive"}
            for i, q in enumerate(args.queries)
        ]
        t0 = time.time()
        # a tombstoned (uncompacted) index refuses pruning algorithms;
        # serve it exhaustively until compaction
        algo = "bmw" if idx.deleted_docids() is None else "naive"
        res = run_queries(idx, batch, k=args.k, algo=algo).collect()
        out["query_sec"] = round(time.time() - t0, 3)
        out["results"] = [
            {"qid": r["qid"], "rank": r["rank"], "docid": r["docid"],
             "score": round(r["score"], 4)}
            for r in res
        ]

    if args.verify:
        from terrier_ef_spark.index.verify import verify_index

        t0 = time.time()
        rep = verify_index(idx, check_positions=args.positions)
        out["verify_sec"] = round(time.time() - t0, 3)
        out["verify_ok"] = rep["ok"]
        out["verify_violations"] = {
            k: c["violations"] for k, c in rep["checks"].items()
            if not c["ok"]
        }
        if not rep["ok"]:
            print(json.dumps(out))
            spark.stop()
            sys.exit(1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
