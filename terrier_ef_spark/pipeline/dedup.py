"""Deduplication operators for training-data pipelines.

- exact_duplicates: hash-groupBy (one shuffle, partial agg).
- minhash_lsh: shingle -> per-band min-md5 signature -> band-bucket
  join. md5 is the cross-engine-stable hash so the DuckDB oracle can
  reproduce signatures bit-for-bit; at scale each band is an
  independent groupBy key, so hot buckets parallelize naturally.
- ngram_jaccard on LSH candidates: exact verification join, candidates
  only (never all pairs).
- simhash64: Arrow-vectorized kernel (no SQL twin — rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from terrier_ef_spark.tokenizer import tokenize_expr

N_BANDS = 8
SHINGLE = 3


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (content_hash, n_docs, keep_docid)."""
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_docid"))
        .where(F.col("n_docs") > 1)
    )


EXACT_DUPLICATES_SQL = """
SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_docid
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def _shingles(col):
    toks = tokenize_expr(col)
    return F.when(
        F.size(toks) >= SHINGLE,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - SHINGLE, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


_SHINGLES_SQL = """
CASE WHEN len(toks) >= 3
     THEN list_distinct(list_transform(range(len(toks) - 2),
                        i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')))
     ELSE [array_to_string(toks, ' ')] END
"""


def minhash_signatures(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, minhash): per band b, min over shingles of
    md5(shingle || '#' || b) — a deterministic MinHash family."""
    d = docs.select("doc_id", _shingles(F.col("text")).alias("sh"))
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    d = d.select("doc_id", "sh", bands)
    return d.select(
        "doc_id",
        "band",
        F.array_min(
            F.transform(
                "sh", lambda s: F.md5(F.concat_ws("#", s, F.col("band").cast("string")))
            )
        ).alias("minhash"),
    )


MINHASH_SIGNATURES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM t
)
SELECT doc_id, band,
       list_aggregate(list_transform(sh, x -> md5(x || '#' || band)), 'min') AS minhash
FROM s, (SELECT unnest(range({N_BANDS})) AS band)
"""


def lsh_candidate_pairs(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing any band signature.
    The join key (band, minhash) is the LSH bucket; output distinct
    (doc_a < doc_b) pairs."""
    # persist: the self-join would otherwise recompute the whole
    # shingle+minhash pipeline for each side
    sig = minhash_signatures(docs, n_bands).persist()
    a = sig.alias("a")
    b = sig.alias("b")
    pairs = (
        a.join(b, ["band", "minhash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


LSH_CANDIDATE_PAIRS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM t
), sig AS (
  SELECT doc_id, band,
         list_aggregate(list_transform(sh, x -> md5(x || '#' || band)), 'min') AS minhash
  FROM s, (SELECT unnest(range({N_BANDS})) AS band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sig a JOIN sig b USING (band, minhash)
WHERE a.doc_id < b.doc_id
"""


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        n_bands: int = N_BANDS) -> DataFrame:
    """Exact n-gram Jaccard similarity on LSH candidates only:
    (doc_a, doc_b, jaccard rounded 6dp) with jaccard >= threshold."""
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).persist()
    pairs = lsh_candidate_pairs(docs, n_bands)
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j


NGRAM_JACCARD_PAIRS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, {_SHINGLES_SQL} AS sh FROM t
), sig AS (
  SELECT doc_id, band,
         list_aggregate(list_transform(sh, x -> md5(x || '#' || band)), 'min') AS minhash
  FROM s, (SELECT unnest(range({N_BANDS})) AS band)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b USING (band, minhash)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.sh, sb.sh))::double
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b
WHERE round(len(list_intersect(sa.sh, sb.sh))::double
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.5
"""


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (Arrow-vectorized batch kernel).
    Hash = md5-low-64 per token; sign-sum per bit."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text.fillna("")):
        toks = [x for x in "".join(
            c if c.isalnum() else " " for c in t.lower()
        ).split() if x]
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in toks),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        sim = np.sum((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        out[i] = np.int64(sim.astype(np.uint64).view(np.int64))
    return pd.Series(out)


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit simhash into 4 x 16-bit
    chunks (pigeonhole: hamming<=3 pairs share at least one chunk),
    bucket-join, verify hamming distance exactly."""
    d = docs.select("doc_id", simhash64(F.col("text")).alias("sim"))
    chunks = d.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("sim", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("doc_id", "sim", "c.chunk", "c.val").persist()  # UDF runs once
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, ["chunk", "val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs
