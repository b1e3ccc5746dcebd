"""Product quantization for embedding columns (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
standard vector-compression path for billion-scale ANN, as in FAISS).

- pq_codebooks: pinned deterministic codebooks (m subspaces × ksub
  centroids), rounded to 6dp so the Spark path and the DuckDB twin
  share EXACT values (same pattern as similarity.fixed_centroids).
- pq_train_codebooks: per-subspace Lloyd k-means on a bounded driver
  sample (FAISS trains codebooks the same way); quality covered by
  pytest (trained beats pinned on quantization error), while the
  CONTRACT key uses the pinned codebooks so encoding + ADC scoring is
  fully SQL-expressible.
- pq_encode: nearest-centroid code per subspace, pure Catalyst — the
  argmin is over explicit left-associative squared-L2 sum chains that
  the SQL twin reproduces term-for-term, so both engines produce
  bit-identical distances and identical codes (first-index tie-break).
- ann_pq_adc_topk: asymmetric distance computation — the query builds
  an m × ksub inner-product table once (full-precision doubles, same
  left-associative chain in Python and SQL), each vector's score is m
  table lookups. One scan over codes, distributed TakeOrdered top-k.

Scale shape: codes are m small ints per vector (64 floats -> 4 bytes
at m=4): the 100-TB corpus scan touches ~64x fewer bytes than
brute-force cosine, encode is a shuffle-free projection, and scoring
is shuffle-free lookups + top-k. No Python in any hot path.
"""

from __future__ import annotations

from functools import reduce
from operator import add

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 4
PQ_KSUB = 8
PQ_SEED = 13
PQ_TRAIN_MAX_SAMPLE = 100_000


def pq_codebooks(
    dim: int, m: int = PQ_M, ksub: int = PQ_KSUB, seed: int = PQ_SEED
) -> np.ndarray:
    """Deterministic (m, ksub, dim//m) codebooks, rounded to 6dp."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    cb = rng.normal(scale=0.5, size=(m, ksub, dim // m))
    return np.round(cb, 6)


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    seed: int = PQ_SEED,
    iters: int = 10,
    max_sample: int = PQ_TRAIN_MAX_SAMPLE,
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a bounded sample (deterministic:
    lowest-vec_id rows). Returns (m, ksub, dsub) rounded to 6dp; feed
    to pq_encode/ann_pq_adc_topk exactly like the pinned codebooks."""
    sample = np.array(
        embeddings.orderBy("vec_id")
        .limit(max_sample)
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    out = np.empty((m, ksub, dsub))
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        cent = x[rng.choice(len(x), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        out[j] = cent
    return np.round(out, 6)


def _sq_dist_expr(j: int, c_vec: np.ndarray, dsub: int):
    """Left-associative sum chain of (emb[i]-cb)^2 — term-for-term
    identical to the SQL twin's chain, so distances agree bitwise."""
    terms = []
    for d in range(dsub):
        e = F.col("embedding").getItem(j * dsub + d).cast("double")
        diff = e - F.lit(float(c_vec[d]))
        terms.append(diff * diff)
    return reduce(add, terms)


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — nearest centroid per subspace,
    ties to the first (lowest) code index."""
    m, ksub, dsub = codebooks.shape
    codes = []
    for j in range(m):
        dists = F.array(
            *[_sq_dist_expr(j, codebooks[j, c], dsub) for c in range(ksub)]
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return embeddings.select("vec_id", F.array(*codes).alias("codes"))


def _adc_tables(qvec: list[float], codebooks: np.ndarray) -> list[list[float]]:
    """Full-precision inner-product tables tab[j][c] = <q_j, cb[j][c]>,
    summed left-associatively in plain Python floats (IEEE doubles) so
    the SQL twin's identical chain reproduces them bitwise."""
    m, ksub, dsub = codebooks.shape
    tabs = []
    for j in range(m):
        row = []
        for c in range(ksub):
            acc = 0.0
            for d in range(dsub):
                acc = acc + float(qvec[j * dsub + d]) * float(
                    codebooks[j, c, d]
                )
            row.append(acc)
        tabs.append(row)
    return tabs


def ann_pq_adc_topk(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """(vec_id, score, rank): approximate inner-product top-k via ADC
    over PQ codes. Tie-break (score desc, vec_id asc)."""
    from pyspark.sql import Window

    if codebooks is None:
        codebooks = pq_codebooks(len(qvec))
    m = codebooks.shape[0]
    tabs = _adc_tables(qvec, codebooks)
    codes = pq_encode(embeddings, codebooks)
    lookups = [
        F.element_at(
            F.array(*[F.lit(v) for v in tabs[j]]),
            F.col("codes").getItem(j) + 1,
        )
        for j in range(m)
    ]
    scored = codes.select(
        "vec_id", F.round(reduce(add, lookups), 6).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "score", "rank"
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _sq_dist_sql(j: int, c_vec: np.ndarray, dsub: int) -> str:
    terms = []
    for d in range(dsub):
        e = f"emb[{j * dsub + d + 1}]"
        v = repr(float(c_vec[d]))
        terms.append(f"({e} - {v}) * ({e} - {v})")
    return " + ".join(terms)


def _pq_cte_sql(codebooks: np.ndarray) -> str:
    """Shared CTE chain ending in c(vec_id, c0..c{m-1})."""
    m, ksub, dsub = codebooks.shape
    dist_lists = ", ".join(
        "["
        + ", ".join(_sq_dist_sql(j, codebooks[j, c], dsub) for c in range(ksub))
        + f"] AS dj{j}"
        for j in range(m)
    )
    code_cols = ", ".join(
        f"(list_position(dj{j}, list_min(dj{j})) - 1)::INT AS c{j}"
        for j in range(m)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
d AS (
  SELECT vec_id, {dist_lists} FROM e
),
c AS (
  SELECT vec_id, {code_cols} FROM d
)"""


def pq_encode_sql(dim: int, codebooks: np.ndarray | None = None) -> str:
    """DuckDB twin of pq_encode over the embeddings view."""
    if codebooks is None:
        codebooks = pq_codebooks(dim)
    m = codebooks.shape[0]
    code_list = "[" + ", ".join(f"c{j}" for j in range(m)) + "]"
    return f"""{_pq_cte_sql(codebooks)}
SELECT vec_id, {code_list} AS codes FROM c
"""


def pq_codes_flat_sql(dim: int, codebooks: np.ndarray | None = None) -> str:
    """Contract-shaped twin: codes as flat INT columns c0..c{m-1}
    (array columns stringify differently across engines' pandas
    bridges, so the gate compares scalars)."""
    if codebooks is None:
        codebooks = pq_codebooks(dim)
    m = codebooks.shape[0]
    cols = ", ".join(f"c{j}" for j in range(m))
    return f"""{_pq_cte_sql(codebooks)}
SELECT vec_id, {cols} FROM c
"""


def ann_pq_adc_from_table_sql(
    dim: int, k: int = 10, codebooks: np.ndarray | None = None
) -> str:
    """Fully self-contained twin: the ADC tables are DERIVED IN SQL
    from the query vector (embeddings vec_id = 0) with the same
    left-associative product/sum chain _adc_tables uses, so the twin
    shares only the pinned codebooks with the engine — scores agree
    bitwise before the final round."""
    if codebooks is None:
        codebooks = pq_codebooks(dim)
    m, ksub, dsub = codebooks.shape
    tab_cols = []
    for j in range(m):
        entries = []
        for c in range(ksub):
            chain = " + ".join(
                f"q[{j * dsub + d + 1}] * {float(codebooks[j, c, d])!r}"
                for d in range(dsub)
            )
            entries.append(f"({chain})")
        tab_cols.append("[" + ", ".join(entries) + f"] AS t{j}")
    lookups = " + ".join(f"t{j}[c{j} + 1]" for j in range(m))
    return f"""{_pq_cte_sql(codebooks)},
qv AS (
  SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0
),
tab AS (
  SELECT {", ".join(tab_cols)} FROM qv
),
sc AS (
  SELECT vec_id, round({lookups}, 6) AS score FROM c CROSS JOIN tab
)
SELECT vec_id, score, rank FROM (
  SELECT vec_id, score,
         row_number() OVER (ORDER BY score DESC, vec_id ASC)::INT AS rank
  FROM sc
) WHERE rank <= {k}
"""


def ann_pq_adc_sql(
    qvec: list[float],
    k: int = 10,
    codebooks: np.ndarray | None = None,
) -> str:
    """DuckDB twin of ann_pq_adc_topk: same codes CTE, ADC lookup via
    the SAME full-precision table literals, round-6 final score."""
    if codebooks is None:
        codebooks = pq_codebooks(len(qvec))
    m = codebooks.shape[0]
    tabs = _adc_tables(qvec, codebooks)
    tab_lookups = " + ".join(
        "([" + ", ".join(repr(v) for v in tabs[j]) + f"])[c{j} + 1]"
        for j in range(m)
    )
    return f"""{_pq_cte_sql(codebooks)},
sc AS (
  SELECT vec_id, round({tab_lookups}, 6) AS score FROM c
)
SELECT vec_id, score, rank FROM (
  SELECT vec_id, score,
         row_number() OVER (ORDER BY score DESC, vec_id ASC)::INT AS rank
  FROM sc
) WHERE rank <= {k}
"""
