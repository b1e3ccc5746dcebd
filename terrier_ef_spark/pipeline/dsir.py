"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
pick raw-corpus documents whose hashed n-gram feature distribution
looks like a small TARGET corpus (the quality/domain exemplar set) by
importance weighting in a reduced feature space:

    features(d)   = hashed unigrams + bigrams of d, bucketed to B
    p_t[b], p_r[b]= additive-smoothed bucket distributions of the
                    target and raw corpora (alpha pseudo-counts)
    log w(d)      = sum_b n_d[b] * (ln p_t[b] - ln p_r[b])
    selection     = Gumbel top-n on log w(d) + g_d  (sampling WITHOUT
                    replacement from the softmax of the weights —
                    the Gumbel-top-k trick the paper's resampling
                    reduces to)

Determinism: the Gumbel noise is g = -ln(-ln(u)) with u the same
md5(salt|doc_id) 52-bit fraction as hash_split (pipeline/sampling.py),
shifted by +1 ulp-of-2^-52 so u is never 0 — identical on every
engine and at any parallelism, so the DuckDB twin reproduces the
selection bit-for-bit. Feature hashing is the first 8 hex digits of
md5(ngram) mod B — again engine-portable.

100 TB shape: ONE exploded feature relation per corpus feeds a
map-side-combined count to B rows; the two B-row models broadcast-join
back onto the raw corpus' per-(doc, bucket) counts (B ~ 10^4-10^5
rows — never the driver); one per-doc sum and one global top-n
(TakeOrdered — no full sort). Bigrams come from one zip_with over the
token array, not a positional self-join. The raw model is fit on the
scored corpus itself, so every scored feature bucket has raw mass
even before smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.tokenizer import tokenize_expr

_FRAC_DIGITS = 13
_FRAC_DENOM = float(16**_FRAC_DIGITS)


def _feature_buckets(docs: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, bucket) rows — one per unigram/bigram feature INSTANCE
    (multiplicity preserved; DSIR's bag-of-hashed-ngrams counts)."""
    toks = tokenize_expr(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b_: F.concat_ws(" ", a, b_),
    )
    feats = F.concat(toks, F.when(n >= 2, bigrams).otherwise(F.array()))
    return docs.select(
        "doc_id", F.explode(feats).alias("feat")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10)
            .cast("long") % buckets
        ).alias("bucket"),
    )


def _bucket_model(feats: DataFrame, buckets: int, alpha: float) -> DataFrame:
    """(bucket, logp): additive-smoothed ln probability per bucket.
    Only buckets with mass appear; absent buckets imply
    ln(alpha / (total + alpha*B)), which callers reconstruct from the
    broadcast 1-row total."""
    cnt = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                (F.col("cnt") + F.lit(alpha))
                / (F.col("total") + F.lit(alpha * buckets))
            ).alias("logp"),
            F.log(
                F.lit(alpha) / (F.col("total") + F.lit(alpha * buckets))
            ).alias("logp0"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    *,
    buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document importance log-weight of `docs` against `target`.

    Returns (doc_id, n_feats, log_w) with log_w rounded 6dp; docs with
    no features (empty text) carry log_w = 0 with n_feats = 0 — no
    evidence either way, the neutral weight."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2: {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing): {alpha}")
    raw_feats = _feature_buckets(docs, buckets)
    tgt_feats = _feature_buckets(target, buckets)
    # guard on FEATURES, not rows: a target whose texts all tokenize
    # to nothing has no distribution either, and would otherwise
    # null-propagate into silently-neutral weights
    if tgt_feats.limit(1).count() == 0:
        raise ValueError("target corpus is empty — no distribution to match")
    raw_m = _bucket_model(raw_feats, buckets, alpha)
    tgt_m = _bucket_model(tgt_feats, buckets, alpha)
    per = raw_feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    # raw model is fit on `docs` itself, so raw.logp always matches;
    # target buckets can be absent -> their smoothed floor logp0
    # (carried on every target row, surfaced via a 1-row broadcast)
    tgt_floor = tgt_m.agg(F.first("logp0").alias("t_floor"))
    joined = (
        per.join(F.broadcast(raw_m.select("bucket", F.col("logp").alias("r_logp"))),
                 "bucket")
        .join(F.broadcast(tgt_m.select("bucket", F.col("logp").alias("t_logp"))),
              "bucket", "left")
        .crossJoin(F.broadcast(tgt_floor))
        .select(
            "doc_id",
            "n",
            (F.col("n") * (F.coalesce("t_logp", "t_floor") - F.col("r_logp"))
             ).alias("contrib"),
        )
    )
    w = joined.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_feats"),
        F.round(F.sum("contrib"), 6).alias("log_w"),
    )
    # empty-text docs: neutral weight
    return (
        docs.select("doc_id")
        .join(w, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    target: DataFrame,
    *,
    n: int,
    buckets: int = 4096,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-n importance resampling: select the n docs with the
    largest log_w + Gumbel(md5-fraction) key — a deterministic,
    parallelism-independent sample without replacement from the
    softmax of the importance weights. Returns (doc_id, log_w, key)
    ordered by key desc (ties doc_id asc), key rounded 6dp."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    w = dsir_logweights(docs, target, buckets=buckets, alpha=alpha)
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string")))
    u = (F.conv(F.substring(h, 1, _FRAC_DIGITS), 16, 10).cast("double") + 1.0) / F.lit(
        _FRAC_DENOM + 1.0
    )
    key = F.round(F.col("log_w") - F.log(-F.log(u)), 6)
    return (
        w.select("doc_id", "log_w", key.alias("key"))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(n)
    )


def dsir_logweights_sql(
    target_where: str, *, buckets: int = 4096, alpha: float = 0.5
) -> str:
    """DuckDB twin of dsir_logweights over the documents table, target
    = documents WHERE <target_where>."""
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM documents
), feat AS (
  SELECT doc_id, unnest(
    list_concat(
      toks,
      CASE WHEN len(toks) >= 2 THEN
        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
      ELSE [] END
    )
  ) AS f
  FROM base
), fb AS (
  SELECT doc_id,
         ('0x' || substring(md5(f), 1, 8))::BIGINT % {buckets} AS bucket
  FROM feat
), tgt_ids AS (
  SELECT doc_id FROM documents WHERE {target_where}
), raw_cnt AS (
  SELECT bucket, count(*)::double AS cnt FROM fb GROUP BY 1
), raw_tot AS (SELECT sum(cnt) AS total FROM raw_cnt),
tgt_cnt AS (
  SELECT bucket, count(*)::double AS cnt
  FROM fb JOIN tgt_ids USING (doc_id) GROUP BY 1
), tgt_tot AS (SELECT sum(cnt) AS total FROM tgt_cnt),
per AS (
  SELECT doc_id, bucket, count(*)::double AS n FROM fb GROUP BY 1, 2
), contrib AS (
  SELECT per.doc_id,
         per.n,
         per.n * (
           ln((coalesce(tc.cnt, 0) + {alpha})
              / (tt.total + {alpha * buckets}))
           - ln((rc.cnt + {alpha}) / (rt.total + {alpha * buckets}))
         ) AS c
  FROM per
  JOIN raw_cnt rc USING (bucket)
  LEFT JOIN tgt_cnt tc USING (bucket)
  CROSS JOIN raw_tot rt CROSS JOIN tgt_tot tt
), w AS (
  SELECT doc_id, sum(n)::bigint AS n_feats, round(sum(c), 6) AS log_w
  FROM contrib GROUP BY 1
)
SELECT d.doc_id,
       coalesce(w.n_feats, 0) AS n_feats,
       coalesce(w.log_w, 0.0) AS log_w
FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
"""


def dsir_sample_sql(
    target_where: str,
    *,
    n: int,
    buckets: int = 4096,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> str:
    """DuckDB twin of dsir_sample (same Gumbel key construction)."""
    inner = dsir_logweights_sql(target_where, buckets=buckets, alpha=alpha)
    u = (
        f"((('0x' || substring(md5('{salt}' || '|' || doc_id::VARCHAR),"
        f" 1, {_FRAC_DIGITS}))::BIGINT::DOUBLE + 1.0) / {_FRAC_DENOM + 1.0!r})"
    )
    return f"""
SELECT doc_id, log_w, key FROM (
  SELECT doc_id, log_w,
         round(log_w - ln(-ln({u})), 6) AS key
  FROM ({inner})
)
ORDER BY key DESC, doc_id ASC
LIMIT {n}
"""
