"""IVF ANN realism experiment: recall@k vs nprobe on a clustered
synthetic at production-like scale (default 1M vectors, nlist=sqrt(n)).

Reproduces the BASELINE.md ANN table:

    python tools/ann_recall.py [--n 1000000] [--dim 64] [--queries 20]

Data model: `latent` well-separated cluster directions + Gaussian noise
(the shape real embedding tables have — ANN on uniform random vectors
is misleadingly hard and unrepresentative). Ground truth is exact
brute-force cosine top-k over the full table; recall@k is averaged
over held-out query vectors drawn near random latent clusters.

The quantizer trains once (sample scaled to the cell count), the
assignment materializes once (the production artifact), and each
nprobe sweep point reuses both — so the latency numbers isolate the
probe+rerank cost, which is what scales with nprobe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--latent", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.15,
                    help="per-dim Gaussian std; 0.15*sqrt(64)=1.2 noise norm "
                         "vs unit signal gives a non-trivial recall curve "
                         "(0.35 makes vectors near-uniform, 0.08 trivial)")
    ap.add_argument("--nprobes", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64])
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from terrier_ef_spark.pipeline.similarity import (
        batch_cosine_topk,
        default_nlist,
        default_nprobe,
        ivf_kmeans_topk,
        kmeans_assign,
        kmeans_fit,
    )
    from terrier_ef_spark.session import get_spark

    spark = get_spark("ann-recall", cores=args.cores)

    # clustered synthetic, generated in executors (no driver matrix):
    # vec i belongs to latent cluster hash(i) % latent; direction +
    # scaled Gaussian noise, L2-normalized
    import pandas as pd

    dim, latent, noise = args.dim, args.latent, args.noise

    def gen(batches):
        rng_dir = np.random.default_rng(4242)
        dirs = rng_dir.normal(size=(latent, dim))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(7_000_000 + int(ids[0]))
            cl = ids % latent
            x = dirs[cl] + noise * rng.standard_normal((len(ids), dim))
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in x]}
            )

    t0 = time.time()
    emb = (
        spark.range(args.n)
        .repartition(args.cores * 2)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
        .persist()
    )
    n = emb.count()
    gen_sec = time.time() - t0

    nlist = default_nlist(n)
    t0 = time.time()
    cen = kmeans_fit(emb, n_clusters=nlist)
    train_sec = time.time() - t0
    t0 = time.time()
    assigned = kmeans_assign(emb, cen).persist()
    csz = assigned.groupBy("cluster").count().agg(
        F.min("count").alias("mn"), F.max("count").alias("mx"),
    ).collect()[0]
    assign_sec = time.time() - t0

    # query vectors: noisy copies near random latent clusters
    rng = np.random.default_rng(99)
    dirs = np.random.default_rng(4242).normal(size=(latent, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    qs = []
    for _ in range(args.queries):
        d = dirs[rng.integers(latent)] + noise * rng.standard_normal(dim)
        qs.append((d / np.linalg.norm(d)).tolist())

    # exact ground truth (one distributed batch job for all queries)
    t0 = time.time()
    gt_rows = batch_cosine_topk(emb, np.asarray(qs), k=args.k).collect()
    brute_sec = (time.time() - t0) / args.queries
    gt = {}
    for r in gt_rows:
        gt.setdefault(r["qidx"], set()).add(r["vec_id"])

    results = []
    for nprobe in args.nprobes:
        hits = total = 0
        lat = []
        for qi, q in enumerate(qs):
            t0 = time.time()
            got = {
                r["vec_id"]
                for r in ivf_kmeans_topk(
                    emb, q, args.k, centroids=cen, nprobe=nprobe,
                    assigned=assigned,
                ).collect()
            }
            lat.append(time.time() - t0)
            hits += len(got & gt[qi])
            total += len(gt[qi])
        results.append(
            {
                "nprobe": nprobe,
                "recall_at_k": round(hits / total, 4),
                "mean_latency_sec": round(float(np.mean(lat)), 3),
                "scan_fraction": round(nprobe / nlist, 4),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    out = {
        "n_vectors": n,
        "dim": dim,
        "latent_clusters": latent,
        "noise": noise,
        "nlist": nlist,
        "default_nprobe": default_nprobe(nlist),
        "k": args.k,
        "n_queries": args.queries,
        "gen_sec": round(gen_sec, 1),
        "train_sec": round(train_sec, 1),
        "assign_sec": round(assign_sec, 1),
        "cell_size_min_max": [int(csz["mn"]), int(csz["mx"])] if csz else None,
        "brute_force_sec_per_query": round(brute_sec, 3),
        "sweep": results,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
