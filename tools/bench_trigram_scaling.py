"""One parallelism level of the TRIGRAM-build scaling bench — the
extreme term-skew build profile (every document shares most frequent
trigrams, so the hot-key handling is what's actually measured). Same
protocol as tools/bench_scaling.py: one process per level (clean JVM),
same deterministic input, warmup build first, best-of-N timed builds.

Usage: python tools/bench_trigram_scaling.py <cores> [n_docs] [reps]
Prints one JSON line: cores, n_docs, trigram postings, best build sec,
postings/sec.
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
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.query.substring import build_trigram_index
    from terrier_ef_spark.session import get_spark

    npart = max(4 * cores, 8)
    spark = get_spark(f"tri-scale-{cores}", cores=cores,
                      shuffle_partitions=npart)
    work = os.path.join(REPO, f".bench_scale_tri_{cores}")

    # warmup (untimed): JVM/Python-worker start + codepaths
    shutil.rmtree(work + "_warm", ignore_errors=True)
    warm = synthesize_corpus(spark, 2000, seed=1, n_partitions=npart)
    build_trigram_index(spark, warm, work + "_warm", n_partitions=npart,
                        resume=False)

    corpus = synthesize_corpus(spark, n_docs, seed=5, n_partitions=npart)
    corpus = corpus.persist()
    corpus.count()  # input off the clock, like bench.py

    best = None
    idx = None
    for _ in range(reps):
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.time()
        idx = build_trigram_index(spark, corpus, work, n_partitions=npart,
                                  resume=False)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n_post = int(idx.stats["num_postings"])
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "postings": n_post,
        "build_sec": round(best, 3),
        "postings_per_sec": int(n_post / best),
    }))
    shutil.rmtree(work + "_warm", ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
