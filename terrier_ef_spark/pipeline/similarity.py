"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: pure Catalyst expressions (zip_with +
  aggregate), one scan + one global top-k — the exact baseline.
- IVF top-k: centroids per label (posexplode + groupBy(pos) — the
  distributed column-mean), probe the nearest centroid's cluster only —
  the scale path (scan shrinks by ~n_clusters).
- embedding near-dup: exact-duplicate vectors via rounded-vector hash.
- a Pandas-UDF batch-cosine kernel for when the query set is large
  (Arrow matrix multiply instead of per-row expressions).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cos_expr(vec_col, qvec: list[float]):
    # cast to double BEFORE multiplying so the arithmetic matches the
    # DuckDB oracle's ::DOUBLE[] semantics exactly
    v = F.transform(vec_col, lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(v, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    n2 = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (n1 * F.lit(n2))


def cosine_topk(embeddings: DataFrame, qvec: list[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k of `qvec` against all embeddings.
    (vec_id, cos, rank), tie-break (cos desc, vec_id asc)."""
    scored = embeddings.select(
        "vec_id", F.round(_cos_expr(F.col("embedding"), qvec), 6).alias("cos")
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Distributed TakeOrdered first; the single-partition ranking
    window then sees at most k rows (never the full scored relation)."""
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "cos", "rank"
    )


def _embedding_dim(embeddings: DataFrame) -> int:
    row = embeddings.select(F.size("embedding").alias("d")).head()
    return int(row["d"])


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid as `dim` per-dimension avg aggregates in ONE
    groupBy — map-side partial aggregation over unexploded rows. (The
    r01 posexplode formulation amplified the shuffle by docs x dims —
    1000x at 1024-dim; here the shuffle carries one partial-agg row per
    (partition, label).) Row output (label, pos, centroid_val) so
    values hash stably."""
    dim = _embedding_dim(embeddings)
    aggs = [
        F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(f"c{i}")
        for i in range(dim)
    ]
    per_label = embeddings.groupBy("label").agg(*aggs)
    # unpivot the (n_labels x dim) result — trivially small by now
    pairs = F.array(*[
        F.struct(F.lit(i).cast("long").alias("pos"), F.col(f"c{i}").alias("v"))
        for i in range(dim)
    ])
    return per_label.select(
        F.col("label").cast("long").alias("label"), F.explode(pairs).alias("p")
    ).select("label", F.col("p.pos").alias("pos"), F.col("p.v").alias("centroid_val"))


LABEL_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS v
  FROM embeddings, unnest(range(len(embedding))) AS t(i)
)
SELECT label::bigint AS label, pos::bigint AS pos,
       round(avg(v), 6) AS centroid_val
FROM ex GROUP BY label, pos
"""


def _collect_centroids(embeddings: DataFrame) -> list[dict]:
    rows = label_centroids(embeddings).collect()
    by_label: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        by_label.setdefault(int(r["label"]), []).append((int(r["pos"]), float(r["centroid_val"])))
    return [
        {"label": lab, "centroid": [v for _, v in sorted(pv)]}
        for lab, pv in sorted(by_label.items())
    ]


def ivf_topk(embeddings: DataFrame, qvec: list[float], k: int = 10) -> DataFrame:
    """IVF-style ANN: pick nearest label-centroid to qvec, then exact
    cosine top-k within that cluster only (the 1/n_clusters scan)."""
    cen = _collect_centroids(embeddings)
    q = np.asarray(qvec, dtype=np.float64)

    def cos(c):
        c = np.asarray(c, dtype=np.float64)
        return float(c @ q / (np.linalg.norm(c) * np.linalg.norm(q)))

    best = max(cen, key=lambda r: (cos(r["centroid"]), -r["label"]))["label"]
    cluster = embeddings.where(F.col("label") == int(best))
    scored = cluster.select(
        "vec_id", F.round(_cos_expr(F.col("embedding"), qvec), 6).alias("cos")
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF with trained k-means coarse quantizer (VERDICT r01 #8: an index,
# not a label router). Train on a bounded driver-side sample (the
# standard IVF shape — FAISS trains the coarse quantizer on a sample),
# assign distributed, probe nprobe clusters at query time.
# ---------------------------------------------------------------------------

def default_nlist(n_vectors: int) -> int:
    """Scale-aware cell count: nlist ~ sqrt(n), the standard IVF sizing
    (probed work ~ nprobe * n / nlist balances against nlist centroid
    scans). Floors at 16 so tiny tables still partition."""
    import math

    return max(16, int(round(math.sqrt(max(n_vectors, 1)))))


def default_nprobe(nlist: int) -> int:
    """Scale-aware probe count: nprobe ~ sqrt(nlist), measured >=0.9
    recall@10 on the 1M-vector clustered synthetic (BASELINE.md ANN
    table; tools/ann_recall.py reproduces it). Floors at 4."""
    import math

    return max(4, int(round(math.sqrt(nlist))))


def kmeans_fit(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 15,
    sample: int | None = None,
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means (cosine) via Lloyd's iterations on a
    deterministic sample (first `sample` vec_ids): kmeans++ seeding with
    a fixed RNG, empty clusters reseeded to the farthest point. Returns
    L2-normalized centroids (n_clusters, dim). The sample bound keeps
    training driver-side and O(sample x dim) regardless of table size;
    assignment stays distributed (kmeans_assign). The default sample
    scales with the cell count (>=100 points per centroid, floor 100k)
    so nlist ~ sqrt(n) configurations still train every cell."""
    if sample is None:
        sample = max(100_000, 100 * n_clusters)
    pdf = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample)
        .toPandas()
    )
    x = np.stack(pdf["embedding"].map(np.asarray).to_list()).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = len(x)
    k = min(n_clusters, n)
    rng = np.random.default_rng(seed)

    # kmeans++ seeding on cosine distance (1 - sim)
    cen = np.empty((k, x.shape[1]))
    cen[0] = x[rng.integers(n)]
    d2 = 1.0 - x @ cen[0]
    for i in range(1, k):
        p = np.maximum(d2, 0)
        p = p / p.sum() if p.sum() > 0 else np.full(n, 1.0 / n)
        cen[i] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, 1.0 - x @ cen[i])

    for _ in range(n_iter):
        sims = x @ cen.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members) == 0:  # reseed to the globally farthest point
                cen[c] = x[np.argmin(np.max(sims, axis=1))]
            else:
                m = members.sum(axis=0)
                cen[c] = m / max(np.linalg.norm(m), 1e-12)
    return cen


def kmeans_assign(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster): distributed argmax-cosine assignment — an
    Arrow matrix multiply per batch against the (small) centroid matrix."""
    cen = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            mat = np.stack(pdf["embedding"].map(np.asarray).to_list()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": np.argmax(mat @ cen.T, axis=1).astype(np.int32),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cluster int"
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    *,
    n_clusters: int | None = None,
    nprobe: int | None = None,
    centroids: np.ndarray | None = None,
    assigned: DataFrame | None = None,
    n_vectors: int | None = None,
) -> DataFrame:
    """Trained-IVF ANN: probe the `nprobe` nearest k-means cells, exact
    cosine top-k within them (scan shrinks ~ nprobe/n_clusters).

    Defaults scale with the table: nlist = sqrt(n) cells, nprobe =
    sqrt(nlist) probes (recall/latency sweep in BASELINE.md; pass
    n_vectors to skip the count). Pass `centroids` to reuse a trained
    quantizer and `assigned` to reuse the materialized (vec_id,
    cluster) assignment — the production artifacts; per-call training/
    assignment is the convenience path for tests and one-offs."""
    if centroids is None:
        if n_clusters is None:
            n_clusters = default_nlist(
                n_vectors if n_vectors is not None else embeddings.count()
            )
        centroids = kmeans_fit(embeddings, n_clusters=n_clusters)
    if nprobe is None:
        nprobe = default_nprobe(len(centroids))
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # stable sort: exact centroid-score ties break by ascending cell id
    # (matches the SQL twin's `ORDER BY ... DESC, cid ASC`)
    probes = np.argsort(-(centroids @ q), kind="stable")[:nprobe].tolist()
    # plain join on vec_id (no broadcast hint): the probed subset is
    # ~nprobe/n_clusters of the table — AQE broadcasts it when small,
    # shuffles when not; in the index lifecycle the assignment is the
    # persisted artifact passed via `assigned`, co-partitioned with the
    # vectors
    if assigned is None:
        assigned = kmeans_assign(embeddings, centroids)
    cluster = embeddings.join(
        assigned.where(F.col("cluster").isin(probes)).select("vec_id"), "vec_id"
    )
    scored = cluster.select(
        "vec_id", F.round(_cos_expr(F.col("embedding"), qvec), 6).alias("cos")
    )
    return _rank_topk(scored, k)


def fixed_centroids(dim: int, n_clusters: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids, rounded to
    6dp so both sides of the correctness gate share EXACT values: the
    Spark path consumes them as a pinned quantizer through the real
    distributed assignment/probe machinery (ivf_kmeans_topk), and the
    DuckDB twin (ann_ivf_fixed_sql) bakes them in as literals. The
    k-means TRAINING itself is not SQL-expressible; its quality is
    covered by the pytest recall/exactness properties instead
    (tests/test_pipeline_ops.py::test_ivf_kmeans_recall_clustered)."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n_clusters, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c, 6)


def ann_ivf_fixed_sql(
    dim: int = 64, n_clusters: int = 16, nprobe: int = 4, k: int = 10
) -> str:
    """DuckDB twin of ivf_kmeans_topk with the fixed_centroids
    quantizer: argmax-dot assignment (kmeans_assign normalizes the
    vector, which cannot change its argmax over centroids), top-nprobe
    cells by query-centroid dot, exact cosine top-k within them."""
    cen = fixed_centroids(dim, n_clusters)
    vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in cen[i])}]::DOUBLE[])"
        for i in range(n_clusters)
    )
    return f"""
WITH cen(cid, c) AS (VALUES {vals}),
qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding::DOUBLE[], cen.c) DESC,
                      cen.cid ASC) AS rk
    FROM embeddings e CROSS JOIN cen
  ) WHERE rk = 1
),
probes AS (
  SELECT cid FROM cen CROSS JOIN qv
  ORDER BY list_dot_product(cen.c, qv.q) DESC, cid ASC LIMIT {nprobe}
)
SELECT vec_id, cos, rank FROM (
  SELECT e.vec_id,
         round(list_dot_product(e.embedding::DOUBLE[], qv.q)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qv.q, qv.q))), 6) AS cos,
         row_number() OVER (
           ORDER BY round(list_dot_product(e.embedding::DOUBLE[], qv.q)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qv.q, qv.q))), 6) DESC, e.vec_id ASC)::int AS rank
  FROM embeddings e
       JOIN assign USING (vec_id)
       JOIN probes ON assign.cid = probes.cid
       CROSS JOIN qv
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs — the vector analogue of
# dedup.simhash_near_dups. Candidate generation is a winner-take-all
# rank signature (Yagnik et al., ICCV 2011): bit j compares two fixed
# vector elements, so the signature is pure integer/compare Catalyst —
# no float summation — and the DuckDB twin reproduces it bit-for-bit.
# Pairs within `max_hamming` signature bits share one of 4 16-bit chunks
# (pigeonhole, exact), bucket-join on the chunk, then verify BOTH the
# exact hamming and the exact cosine. The twin brute-forces all pairs,
# independently proving the chunk decomposition loses nothing.
# ---------------------------------------------------------------------------

NEAR_DUP_NBITS = 64
NEAR_DUP_MAX_HAMMING = 3
NEAR_DUP_MIN_COS = 0.99
# bucket cap (same rationale as dedup.MAX_BUCKET): a cluster of M
# identical vectors would emit M^2 candidates; capped buckets are
# excluded BEFORE the self-join and enumerable via the ledger
NEAR_DUP_MAX_BUCKET = 256


@lru_cache(maxsize=16)
def wta_pairs(dim: int, nbits: int = NEAR_DUP_NBITS) -> tuple[tuple[int, int], ...]:
    """Deterministic WTA element-pair schedule: bit j compares
    emb[p_j] > emb[q_j]. All ordered (p, q) pairs are enumerated and
    permuted by a fixed integer mix, so the nbits pairs are DISTINCT
    whenever nbits <= dim*(dim-1) — every signature bit is an
    independent comparison regardless of dim (a stride schedule would
    silently repeat pairs for dim < nbits, halving the hamming
    tolerance). Only cycles for degenerate dims (dim*(dim-1) < nbits)."""
    if dim < 2:
        raise ValueError("WTA signature needs at least 2 dimensions")
    pairs = [(p, q) for p in range(dim) for q in range(dim) if p != q]

    def mix(i: int) -> int:
        x = (i * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 2246822519) & 0xFFFFFFFF
        x ^= x >> 13
        return x

    order = sorted(range(len(pairs)), key=lambda i: (mix(i), i))
    # tuple: the result is lru_cached and must stay immutable
    return tuple(pairs[order[i % len(order)]] for i in range(nbits))


def _wta_sig_cols(emb_col, pairs: list[tuple[int, int]]):
    """(lo, hi) 32-bit signature halves as pure Catalyst integer sums
    (each half stays well inside a signed long)."""
    lo = F.lit(0).cast("long")
    hi = F.lit(0).cast("long")
    for j, (p, q) in enumerate(pairs):
        bit = F.when(emb_col[p] > emb_col[q], F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        if j < 32:
            lo = lo + bit * F.lit(1 << j).cast("long")
        else:
            hi = hi + bit * F.lit(1 << (j - 32)).cast("long")
    return lo, hi


def _chunk_explode():
    """Explode the (lo, hi) signature into 4 x 16-bit chunk keys
    (pigeonhole bands for hamming <= 3)."""
    halves = {0: "lo", 1: "lo", 2: "hi", 3: "hi"}
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(halves[i], 16 * (i % 2))
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ])
    ).alias("c")


def planted_near_dup_union(
    embeddings: DataFrame, offset: int = 1_000_000, decimals: int = 2
) -> DataFrame:
    """embeddings ∪ a deterministically-perturbed copy (vec_id + offset,
    elements rounded to `decimals`): synthesizes known near-dups so the
    near-dup operator has non-trivial, reproducible output on corpora
    with no organic near-dups (the testdata vectors are ~uniform
    random). Round-to-decimals of doubles has no representable ties, so
    DuckDB reproduces the copy bit-for-bit."""
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = embeddings.select(F.col("vec_id").cast("long").alias("vec_id"), dbl.alias("emb"))
    copy = embeddings.select(
        (F.col("vec_id") + offset).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: F.round(x.cast("double"), decimals)).alias("emb"),
    )
    return base.unionByName(copy)


def embedding_near_dups(
    vectors: DataFrame,
    max_hamming: int = NEAR_DUP_MAX_HAMMING,
    min_cos: float = NEAR_DUP_MIN_COS,
    max_bucket: int | None = NEAR_DUP_MAX_BUCKET,
) -> DataFrame:
    """(vec_id_a, vec_id_b, hamming, cos) for pairs with WTA-signature
    hamming <= max_hamming AND round(cosine, 6) >= min_cos over a
    (vec_id, emb: array<double>) relation (see planted_near_dup_union).
    Candidates come from 4 x 16-bit signature-chunk buckets (pigeonhole:
    hamming<=3 pairs share a chunk — exact, not probabilistic); both
    predicates are then verified exactly, so the output equals the
    brute-force definition while the work is bucket-local."""
    from terrier_ef_spark.util import eager_release

    head = vectors.select(F.size("emb").alias("d")).head()
    if head is None:  # empty relation: no pairs
        return vectors.sparkSession.createDataFrame(
            [], "vec_id_a long, vec_id_b long, hamming int, cos double"
        )
    dim = int(head["d"])
    lo, hi = _wta_sig_cols(F.col("emb"), wta_pairs(dim))
    # persist the signature relation once; the bucket machinery below
    # moves ONLY (vec_id, chunk, val) rows — the wide emb column never
    # rides the explode/window/self-join shuffles (at 1024-dim that
    # would be a 4x vector replication), it is joined back by vec_id
    # for the candidate verify only
    sigs = vectors.select("vec_id", "emb", lo.alias("lo"), hi.alias("hi")).persist()
    chunks = sigs.select("vec_id", _chunk_explode()).select(
        "vec_id", "c.chunk", "c.val"
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("chunk", "val")
        chunks = chunks.withColumn("bn", F.count(F.lit(1)).over(w)).where(
            F.col("bn") <= max_bucket
        ).drop("bn")
    cand = (
        chunks.alias("ca")
        .join(chunks.alias("cb"), ["chunk", "val"])
        .where(F.col("ca.vec_id") < F.col("cb.vec_id"))
        .select(
            F.col("ca.vec_id").alias("vec_id_a"),
            F.col("cb.vec_id").alias("vec_id_b"),
        )
        .distinct()
    )
    a = sigs.select(
        F.col("vec_id").alias("vec_id_a"), F.col("emb").alias("emb_a"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = sigs.select(
        F.col("vec_id").alias("vec_id_b"), F.col("emb").alias("emb_b"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    ham = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    pairs = (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            ham.alias("hamming"),
            F.round(dot / (norm("emb_a") * norm("emb_b")), 6).alias("cos"),
        )
        .where((F.col("hamming") <= max_hamming) & (F.col("cos") >= min_cos))
    )
    return eager_release(pairs, sigs)


def embedding_near_dup_skipped_buckets(
    vectors: DataFrame, max_bucket: int = NEAR_DUP_MAX_BUCKET
) -> DataFrame:
    """(chunk, val, n_vecs) for every signature bucket the cap excluded
    — the explicit no-silent-truncation ledger (cf. lsh_skipped_buckets)."""
    head = vectors.select(F.size("emb").alias("d")).head()
    if head is None:
        return vectors.sparkSession.createDataFrame(
            [], "chunk int, val long, n_vecs long"
        )
    dim = int(head["d"])
    lo, hi = _wta_sig_cols(F.col("emb"), wta_pairs(dim))
    sigs = vectors.select("vec_id", lo.alias("lo"), hi.alias("hi"))
    chunks = sigs.select("vec_id", _chunk_explode()).select(
        "vec_id", "c.chunk", "c.val"
    )
    return (
        chunks.groupBy("chunk", "val")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .where(F.col("n_vecs") > max_bucket)
    )


def embedding_near_dups_sql(
    dim: int = 64,
    offset: int = 1_000_000,
    decimals: int = 2,
    max_hamming: int = NEAR_DUP_MAX_HAMMING,
    min_cos: float = NEAR_DUP_MIN_COS,
) -> str:
    """DuckDB twin over the `embeddings` view: planted union + WTA
    signature recomputed bit-for-bit, then BRUTE-FORCE hamming+cosine
    over all pairs — independently proving the Spark side's pigeonhole
    candidate generation loses nothing."""
    wta_vals = ", ".join(
        f"({j}, {p}, {q})" for j, (p, q) in enumerate(wta_pairs(dim))
    )
    return f"""
WITH allv AS (
  SELECT vec_id::BIGINT AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS emb
  FROM embeddings
  UNION ALL
  SELECT (vec_id + {offset})::BIGINT,
         list_transform(embedding, x -> round(x::DOUBLE, {decimals}))
  FROM embeddings
), wta(j, p, q) AS (VALUES {wta_vals}),
bits AS (
  SELECT vec_id, j,
         CASE WHEN emb[p + 1] > emb[q + 1] THEN 1::BIGINT ELSE 0::BIGINT END AS b
  FROM allv CROSS JOIN wta
), sig AS (
  SELECT vec_id,
         sum(CASE WHEN j < 32 THEN b * (1::BIGINT << j) ELSE 0 END) AS lo,
         sum(CASE WHEN j >= 32 THEN b * (1::BIGINT << (j - 32)) ELSE 0 END) AS hi
  FROM bits GROUP BY 1
), pairs AS (
  SELECT sa.vec_id AS vec_id_a, sb.vec_id AS vec_id_b,
         (bit_count(xor(sa.lo, sb.lo)) + bit_count(xor(sa.hi, sb.hi)))::INT AS hamming,
         round(list_dot_product(va.emb, vb.emb)
               / (sqrt(list_dot_product(va.emb, va.emb))
                  * sqrt(list_dot_product(vb.emb, vb.emb))), 6) AS cos
  FROM sig sa JOIN sig sb ON sa.vec_id < sb.vec_id
       JOIN allv va ON va.vec_id = sa.vec_id
       JOIN allv vb ON vb.vec_id = sb.vec_id
)
SELECT vec_id_a, vec_id_b, hamming, cos
FROM pairs WHERE hamming <= {max_hamming} AND cos >= {min_cos}
"""


def embedding_exact_dups(embeddings: DataFrame, decimals: int = 6) -> DataFrame:
    """Exact near-dup vectors: hash of the vector rounded to `decimals`."""
    key = F.md5(
        F.to_json(F.transform("embedding", lambda x: F.round(x.cast("double"), decimals)))
    )
    return (
        embeddings.select("vec_id", key.alias("vhash"))
        .groupBy("vhash")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("keep_vec_id"))
        .where(F.col("n") > 1)
    )


def batch_cosine_topk(embeddings: DataFrame, queries: np.ndarray, k: int = 10) -> DataFrame:
    """Arrow-batched matrix-multiply cosine: many query vectors at once.
    Returns (qidx, vec_id, cos) for per-partition top-k, then global
    top-k per qidx — the scale path for bulk ANN scoring."""
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    n_q = len(qn)

    def score(batches):
        for pdf in batches:
            mat = np.stack(pdf["embedding"].map(np.asarray).to_list()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ qn.T  # (rows, n_q)
            top = min(k, len(pdf))
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # (top, n_q)
            rows = idx.T.ravel()  # query-major so it aligns with qidx
            qidx = np.repeat(np.arange(n_q), top)
            yield pd.DataFrame(
                {
                    "qidx": qidx.astype(np.int32),
                    "vec_id": pdf["vec_id"].to_numpy()[rows],
                    "cos": sims[rows, qidx],
                }
            )

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema="qidx int, vec_id long, cos double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qidx").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qidx", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
