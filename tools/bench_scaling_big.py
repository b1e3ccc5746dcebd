"""Build-only scaling measurement at LARGE synthetic input.

The small (100k-doc, ~20s-at-8-cores) scaling pair under-states
efficiency: per-job fixed costs (session spin-up amortization aside —
driver planning, stage scheduling, lexicon/stats finalize) are a
constant few seconds, which is a visible fraction of a 20-second job
and noise on a 20-minute one. A real N-vs-4N-executor comparison runs
multi-hour builds where those costs vanish; this harness approximates
that regime with a 3x-plus input so the timed work is dominated by the
tokenize/shuffle/encode pipeline itself.

Usage: python tools/bench_scaling_big.py <cores> <n_docs> <out_json> [n_partitions]
Each invocation is one clean JVM at one parallelism level (same cached
corpus parquet across levels -> identical input, byte-identical index).
n_partitions defaults to 4 tasks per core (Spark's standard guidance:
with one task per core a single straggler extends the whole stage; 4
waves average stragglers out) — the SAME sizing rule at every level,
exactly as a real cluster job sizes shuffle partitions to cluster size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    out_path = sys.argv[3]
    n_partitions = int(sys.argv[4]) if len(sys.argv) > 4 else max(4 * cores, 8)

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.session import get_spark

    spark = get_spark(f"scale-big-{cores}", cores=cores,
                      shuffle_partitions=n_partitions)
    corpus_dir = os.path.join(REPO, f".bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synthesize_corpus(spark, n_docs, seed=42, n_partitions=64) \
            .write.mode("overwrite").parquet(corpus_dir)
    synth = spark.read.parquet(corpus_dir)

    work = os.path.join(REPO, f".bench_big_{cores}")
    # untimed warmup: JVM/Python-worker/codegen caches
    shutil.rmtree(work + "_warm", ignore_errors=True)
    build_index(spark, synthesize_corpus(spark, 2000, seed=1,
                                         n_partitions=max(cores, 8)),
                work + "_warm", n_partitions=n_partitions, resume=False)
    shutil.rmtree(work + "_warm", ignore_errors=True)

    times = []
    for _ in range(2):
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.time()
        idx = build_index(spark, synth, work,
                          n_partitions=n_partitions, resume=False)
        times.append(time.time() - t0)
    res = {
        "cores": cores,
        "n_partitions": n_partitions,
        "n_docs": n_docs,
        "build_secs": [round(t, 1) for t in times],
        "build_sec_best": round(min(times), 1),
        "num_postings": idx.stats["num_postings"],
        "postings_per_sec": round(idx.stats["num_postings"] / min(times)),
    }
    shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as fh:
        json.dump(res, fh)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
