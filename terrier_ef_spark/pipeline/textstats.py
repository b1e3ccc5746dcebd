"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions (JVM, codegen) with exact
DuckDB-SQL twins for the correctness oracle — zero Python in the hot
path, so they scale to 100 TB as plain scans."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.tokenizer import tokenize_expr

# small fixed English stopword list (role of the reference's 733-word
# stopword-list.txt, EFSetupTest.java:106-107) — kept tiny and inline so
# the SQL twin is literal-identical
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "as", "with", "this", "that", "at", "by", "from", "be",
]
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def token_counts(docs: DataFrame) -> DataFrame:
    """doc_id, whitespace-token count, word-token count (BPE-ish regex)."""
    toks = tokenize_expr(F.col("text"))
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_word_tokens"),
    )


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_word_tokens
FROM documents
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + combined score (rounded to 6dp)."""
    toks = tokenize_expr(F.col("text"))
    alnum_sp = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    d = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            (F.length("text") - alnum_sp) / F.greatest(F.length("text"), F.lit(1)), 6
        ).alias("punct_ratio"),
        F.round(
            F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )
    return d


QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
       round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(list_filter(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                             x -> list_contains({_SW_SQL}, x)))
             / greatest(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')), 1), 6)
           AS stopword_ratio,
       round(list_aggregate(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                                           x -> length(x)), 'sum')
             / greatest(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')), 1), 6)
           AS mean_token_len
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram-free language heuristic: stopword ratio -> 'en' vs 'other'."""
    toks = tokenize_expr(F.col("text"))
    ratio = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))) / F.greatest(
        F.size(toks), F.lit(1)
    )
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


LANG_ID_SQL = f"""
SELECT doc_id,
       CASE WHEN len(list_filter(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                                 x -> list_contains({_SW_SQL}, x)))
                 / greatest(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')), 1)
                 >= 0.03
            THEN 'en' ELSE 'other' END AS lang_pred
FROM documents
"""


def fingerprint(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """Document fingerprint: minimum md5 over 3-token shingles (a
    winnowing-style rolling fingerprint; md5 is the cross-engine-stable
    hash). Docs shorter than the shingle fall back to whole-text md5."""
    toks = tokenize_expr(F.col("text"))
    d = docs.select("doc_id", F.col("text"), toks.alias("toks"))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - shingle, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i + 1, shingle))),
    )
    return d.select(
        "doc_id",
        F.when(F.size("toks") >= shingle, F.array_min(sh))
        .otherwise(F.md5(F.concat_ws(" ", F.col("toks"))))
        .alias("fingerprint"),
    )


FINGERPRINT_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_aggregate(list_transform(range(len(toks) - 2),
                                               i -> md5(array_to_string(list_slice(toks, i + 1, i + 3), ' '))),
                                'min')
            ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
FROM t
"""
