"""Maximal Marginal Relevance (MMR) diversified top-k.

Carbonell & Goldstein, SIGIR 1998: greedily pick the candidate that
maximizes  lambda * sim(q, d) - (1 - lambda) * max_{s in S} sim(d, s)
— relevance traded against redundancy to the already-selected set S.
The training-data use: sampling RETRIEVAL-diverse exemplars instead of
k near-duplicates of the same hot document.

Scale shape: the candidate pool comes from any distributed retriever
(brute-force/IVF/PQ cosine top-`pool`); MMR itself is inherently
sequential (each pick depends on the set so far), so it runs on the
DRIVER over the pool — a deliberate, bounded collect of `pool` rows
(<= a few hundred), exactly like the reference ecosystem's rerankers.
pool and k bound the cost; the corpus never leaves the cluster. Not
SQL-expressible as one query (greedy recursion) — verified by a
clean-room Python mirror in tests instead of a DuckDB twin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from terrier_ef_spark.pipeline.similarity import cosine_topk


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    pool: int = 100,
    lam: float = 0.7,
) -> DataFrame:
    """(vec_id, mmr, rank): k MMR-selected vectors from the cosine
    top-`pool` candidates. lam=1.0 degenerates to plain cosine top-k;
    lam=0 picks maximally spread vectors. Ties break on vec_id asc."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k < 1 or pool < k:
        raise ValueError("need pool >= k >= 1")
    spark = embeddings.sparkSession
    cand = (
        cosine_topk(embeddings, query_vec, pool)
        .join(embeddings.select("vec_id", "embedding"), "vec_id")
        .collect()
    )
    if not cand:
        return spark.createDataFrame([], "vec_id long, mmr double, rank int")
    cand.sort(key=lambda r: r["rank"])
    ids = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    rel = np.array([r["cos"] for r in cand], dtype=np.float64)
    mat = np.array([r["embedding"] for r in cand], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T

    selected: list[int] = []
    scores: list[float] = []
    red = np.full(len(ids), -np.inf)
    for _ in range(min(k, len(ids))):
        if selected:
            mmr = lam * rel - (1 - lam) * red
        else:
            mmr = lam * rel
        mmr[selected] = -np.inf
        # tie-break: highest mmr, then smallest vec_id
        best = int(np.lexsort((ids, -mmr))[0])
        selected.append(best)
        scores.append(float(mmr[best]))
        red = np.maximum(red, sims[:, best])
    rows = [
        (int(ids[i]), round(s, 6), r + 1)
        for r, (i, s) in enumerate(zip(selected, scores))
    ]
    return spark.createDataFrame(rows, "vec_id long, mmr double, rank int")
