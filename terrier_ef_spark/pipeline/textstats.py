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


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics (Rae et al., "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", 2021,
# Table A1 repetition filters). Per document:
#   dup_line_frac        duplicated-line occurrences / total lines
#   dup_line_char_frac   chars in duplicated-line occurrences / line chars
#   top_{2,3}gram_char_frac  chars covered by the most frequent word
#                            n-gram (count * gram length) / doc chars
#   dup_5gram_char_frac  occurrence-weighted chars of 5-grams appearing
#                        more than once / doc chars (overlap-counted,
#                        clamped at 1.0 — documented simplification of
#                        the paper's non-overlapping coverage)
# "doc chars" = length of the space-joined token string. Ties for the
# top gram break to the lexicographically LARGEST gram (max-struct
# semantics, mirrored in the SQL twin with ORDER BY cnt DESC, unit
# DESC).
#
# Scale shape: ONE scan of documents; every unit (line / n-gram
# occurrence) becomes one row via a single explode (no self-join, no
# quadratic blow-up on boilerplate); counting is a two-phase
# HashAggregate on (doc_id, kind, unit) then (doc_id, kind) — partial
# aggregation absorbs hot units map-side; the final per-doc pivot and
# the doc_chars join are O(docs). Same plan family as
# dedup.duplicate_span_stats (plan audit in BASELINE.md).
# ---------------------------------------------------------------------------

REP_GRAM_NS = (2, 3, 5)
# thresholds from Gopher Table A1 (subset matching the stats we emit)
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "dup_5gram_char_frac": 0.15,
}

_UNIT_T = "array<struct<kind:string,unit:string>>"


def repetition_stats(docs: DataFrame) -> DataFrame:
    """doc_id + Gopher repetition fractions + gopher_flagged (0/1)."""
    toks = tokenize_expr(F.col("text"))
    lines = F.filter(F.split(F.col("text"), "\n"), lambda x: x != F.lit(""))
    base = docs.select(
        "doc_id", toks.alias("toks"), lines.alias("lines")
    ).select(
        "doc_id",
        "toks",
        "lines",
        (
            F.aggregate(
                "toks", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            )
            + F.greatest(F.size("toks") - 1, F.lit(0))
        ).alias("doc_chars"),
    )

    unit_arrays = [
        F.transform(
            "lines",
            lambda x: F.struct(F.lit("line").alias("kind"), x.alias("unit")),
        )
    ]
    def _gram_units(n: int):
        # single-parameter lambda: a 2-arg lambda would make transform
        # pass (element, index) and shadow the captured n
        return F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.struct(
                F.lit(f"g{n}").alias("kind"),
                F.concat_ws(" ", F.slice("toks", i + 1, n)).alias("unit"),
            ),
        )

    for n in REP_GRAM_NS:
        grams = _gram_units(n)
        # guard: sequence(0, negative) would run backwards
        unit_arrays.append(
            F.when(F.size("toks") >= n, grams).otherwise(
                F.array().cast(_UNIT_T)
            )
        )

    units = base.select(
        "doc_id", F.explode(F.concat(*unit_arrays)).alias("u")
    ).select("doc_id", "u.kind", "u.unit")

    counts = units.groupBy("doc_id", "kind", "unit").agg(
        F.count("*").cast("long").alias("cnt")
    )
    chars = (F.col("cnt") * F.length("unit")).cast("long")
    per_kind = counts.groupBy("doc_id", "kind").agg(
        F.sum("cnt").alias("tot_cnt"),
        F.sum(chars).alias("tot_chars"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(
            "dup_cnt"
        ),
        F.sum(F.when(F.col("cnt") >= 2, chars).otherwise(0)).alias(
            "dup_chars"
        ),
        F.max(F.struct("cnt", "unit")).alias("top"),
    )
    # repetition requires recurrence: a count-1 "top" gram (any short
    # doc) contributes 0, so min-length filtering stays a separate
    # concern from repetition flagging
    top_chars = (
        F.when(
            F.col("top.cnt") >= 2, F.col("top.cnt") * F.length("top.unit")
        )
        .otherwise(0)
        .cast("long")
    )
    piv = per_kind.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("kind") == "line", F.col("dup_cnt") / F.col("tot_cnt"))
        ).alias("line_dup"),
        F.max(
            F.when(
                F.col("kind") == "line",
                F.col("dup_chars") / F.greatest("tot_chars", F.lit(1)),
            )
        ).alias("line_dup_chars"),
        F.max(F.when(F.col("kind") == "g2", top_chars)).alias("g2_top"),
        F.max(F.when(F.col("kind") == "g3", top_chars)).alias("g3_top"),
        F.max(F.when(F.col("kind") == "g5", F.col("dup_chars"))).alias(
            "g5_dup"
        ),
    )

    dc = F.greatest("doc_chars", F.lit(1))
    out = (
        base.select("doc_id", "doc_chars")
        .join(piv, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("line_dup", F.lit(0.0)), 6).alias(
                "dup_line_frac"
            ),
            F.round(F.coalesce("line_dup_chars", F.lit(0.0)), 6).alias(
                "dup_line_char_frac"
            ),
            F.round(F.coalesce("g2_top", F.lit(0)) / dc, 6).alias(
                "top_2gram_char_frac"
            ),
            F.round(F.coalesce("g3_top", F.lit(0)) / dc, 6).alias(
                "top_3gram_char_frac"
            ),
            F.round(
                F.least(F.lit(1.0), F.coalesce("g5_dup", F.lit(0)) / dc), 6
            ).alias("dup_5gram_char_frac"),
        )
    )
    t = GOPHER_THRESHOLDS
    return out.withColumn(
        "gopher_flagged",
        (
            (F.col("dup_line_frac") > t["dup_line_frac"])
            | (F.col("dup_line_char_frac") > t["dup_line_char_frac"])
            | (F.col("top_2gram_char_frac") > t["top_2gram_char_frac"])
            | (F.col("top_3gram_char_frac") > t["top_3gram_char_frac"])
            | (F.col("dup_5gram_char_frac") > t["dup_5gram_char_frac"])
        ).cast("int"),
    )


_REP_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

REPETITION_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         {_REP_TOKS} AS toks,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         coalesce(list_aggregate(list_transform({_REP_TOKS}, x -> length(x)), 'sum'), 0)
           + greatest(len({_REP_TOKS}) - 1, 0) AS doc_chars
  FROM documents
),
units AS (
  SELECT doc_id, 'line' AS kind, unnest(lines) AS unit FROM base
  UNION ALL
  SELECT doc_id, 'g2', unnest(list_transform(range(len(toks) - 1),
                                             i -> array_to_string(toks[i + 1: i + 2], ' ')))
  FROM base WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id, 'g3', unnest(list_transform(range(len(toks) - 2),
                                             i -> array_to_string(toks[i + 1: i + 3], ' ')))
  FROM base WHERE len(toks) >= 3
  UNION ALL
  SELECT doc_id, 'g5', unnest(list_transform(range(len(toks) - 4),
                                             i -> array_to_string(toks[i + 1: i + 5], ' ')))
  FROM base WHERE len(toks) >= 5
),
counts AS (
  SELECT doc_id, kind, unit, count(*)::BIGINT AS cnt
  FROM units GROUP BY ALL
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, kind
                               ORDER BY cnt DESC, unit DESC) AS rk
  FROM counts
),
per_kind AS (
  SELECT doc_id, kind,
         sum(cnt) AS tot_cnt,
         sum(cnt * length(unit)) AS tot_chars,
         sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_cnt,
         sum(CASE WHEN cnt >= 2 THEN cnt * length(unit) ELSE 0 END) AS dup_chars,
         sum(CASE WHEN rk = 1 AND cnt >= 2 THEN cnt * length(unit) ELSE 0 END) AS top_chars
  FROM ranked GROUP BY ALL
),
piv AS (
  SELECT doc_id,
         max(CASE WHEN kind = 'line' THEN dup_cnt / tot_cnt END) AS line_dup,
         max(CASE WHEN kind = 'line' THEN dup_chars / greatest(tot_chars, 1) END) AS line_dup_chars,
         max(CASE WHEN kind = 'g2' THEN top_chars END) AS g2_top,
         max(CASE WHEN kind = 'g3' THEN top_chars END) AS g3_top,
         max(CASE WHEN kind = 'g5' THEN dup_chars END) AS g5_dup
  FROM per_kind GROUP BY doc_id
)
SELECT b.doc_id,
       round(coalesce(line_dup, 0), 6) AS dup_line_frac,
       round(coalesce(line_dup_chars, 0), 6) AS dup_line_char_frac,
       round(coalesce(g2_top, 0) / greatest(doc_chars, 1), 6) AS top_2gram_char_frac,
       round(coalesce(g3_top, 0) / greatest(doc_chars, 1), 6) AS top_3gram_char_frac,
       round(least(1.0, coalesce(g5_dup, 0) / greatest(doc_chars, 1)), 6) AS dup_5gram_char_frac,
       (round(coalesce(line_dup, 0), 6) > 0.30
        OR round(coalesce(line_dup_chars, 0), 6) > 0.20
        OR round(coalesce(g2_top, 0) / greatest(doc_chars, 1), 6) > 0.20
        OR round(coalesce(g3_top, 0) / greatest(doc_chars, 1), 6) > 0.18
        OR round(least(1.0, coalesce(g5_dup, 0) / greatest(doc_chars, 1)), 6) > 0.15
       )::INT AS gopher_flagged
FROM base b LEFT JOIN piv USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Windowed term co-occurrence with PMI
# ---------------------------------------------------------------------------
# The corpus-analysis staple behind embedding pipelines (word2vec/GloVe
# co-occurrence counting): count unordered term pairs within a forward
# token window, score by pointwise mutual information
#     pmi(a,b) = log2( (n_ab / N_pairs) / ((n_a / N_tok) * (n_b / N_tok)) )
# Scale shape: the positional self-join keys on doc_id and emits at most
# window x N_tok rows (the standard co-occurrence fanout); the pair count
# is a groupBy with map-side partial aggregation, so boilerplate-hot
# pairs combine before the shuffle. min_count prunes the tail BEFORE the
# PMI arithmetic; top_k is a distributed TakeOrdered.

COOC_WINDOW = 5
COOC_MIN_COUNT = 5
COOC_TOP_K = 100


def term_cooccurrence(
    docs: DataFrame,
    window: int = COOC_WINDOW,
    min_count: int = COOC_MIN_COUNT,
    top_k: int = COOC_TOP_K,
) -> DataFrame:
    """(term_a, term_b, n_ab, pmi): top_k unordered within-`window`
    co-occurring pairs by PMI (6dp; ties broken on the pair), pairs with
    fewer than min_count occurrences dropped. Self-pairs excluded."""
    from terrier_ef_spark.util import eager_release

    # persist: the token stream feeds both join sides, the marginals and
    # the total; the pair counts feed both the normalizer and the score
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_expr(F.col("text"))).alias("pos", "term")
    ).persist()
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("term").alias("ta"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("term").alias("tb"))
    pairs = (
        a.join(b, "doc_id")
        .where(
            (F.col("pb") > F.col("pa"))
            & (F.col("pb") - F.col("pa") <= window)
            & (F.col("ta") != F.col("tb"))
        )
        .select(
            F.least("ta", "tb").alias("term_a"),
            F.greatest("ta", "tb").alias("term_b"),
        )
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
        .persist()
    )
    n_pairs = float(pairs.agg(F.sum("n_ab").alias("np")).collect()[0]["np"] or 0.0)
    marg = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    n_tok = float(toks.count())
    pmi = F.log2(
        (F.col("n_ab") / F.lit(n_pairs))
        / ((F.col("na") / F.lit(n_tok)) * (F.col("nb") / F.lit(n_tok)))
    )
    scored = (
        pairs.join(marg.select(F.col("term").alias("term_a"), F.col("n").alias("na")), "term_a")
        .join(marg.select(F.col("term").alias("term_b"), F.col("n").alias("nb")), "term_b")
        .select(
            "term_a", "term_b", F.col("n_ab").cast("long").alias("n_ab"),
            F.round(pmi, 6).alias("pmi"),
        )
    )
    out = scored.orderBy(
        F.desc("pmi"), F.asc("term_a"), F.asc("term_b")
    ).limit(top_k)
    return eager_release(out, toks, pairs)


def term_cooccurrence_sql(
    window: int = COOC_WINDOW,
    min_count: int = COOC_MIN_COUNT,
    top_k: int = COOC_TOP_K,
) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS term
  FROM t, unnest(range(len(toks))) AS u(i)
), ntok AS (
  SELECT count(*)::double AS n FROM tok
), pairs AS (
  SELECT least(a.term, b.term) AS term_a,
         greatest(a.term, b.term) AS term_b,
         count(*)::bigint AS n_ab
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND b.pos > a.pos AND b.pos - a.pos <= {window}
   AND a.term <> b.term
  GROUP BY 1, 2
  HAVING count(*) >= {min_count}
), npairs AS (
  SELECT sum(n_ab)::double AS np FROM pairs
), marg AS (
  SELECT term, count(*)::double AS n FROM tok GROUP BY 1
)
SELECT term_a, term_b, n_ab,
       round(log2((n_ab / npairs.np)
                  / ((ma.n / ntok.n) * (mb.n / ntok.n))), 6) AS pmi
FROM pairs
JOIN marg ma ON ma.term = pairs.term_a
JOIN marg mb ON mb.term = pairs.term_b
CROSS JOIN npairs CROSS JOIN ntok
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {top_k}
"""


# ---------------------------------------------------------------------------
# Composite quality filter (C4/Gopher-style keep/drop with reasons)
# ---------------------------------------------------------------------------
# The decision layer a training-data pipeline runs after the feature
# ops: combine token-count bounds, mean-token-length bounds, punctuation
# and stopword-ratio thresholds (C4, Raffel et al. 2020) with the
# Gopher repetition flag (Rae et al. 2021) into one (keep, reasons)
# verdict per document. Reasons are explicit — a silent drop is a
# debugging dead end at 100 TB; the reasons string doubles as the
# no-silent-truncation ledger for the filter stage. Scale shape:
# map-only over the two feature relations, one doc_id equi-join (both
# sides share the documents scan partitioning), zero Python.

FILTER_MIN_TOKENS = 50
FILTER_MAX_TOKENS = 100_000
FILTER_MIN_MEAN_TOK = 2.0
FILTER_MAX_MEAN_TOK = 12.0
FILTER_MAX_PUNCT = 0.30
FILTER_MIN_STOPWORD = 0.0005


def filter_pipeline(docs: DataFrame) -> DataFrame:
    """(doc_id, keep, reasons): reasons is a comma-joined list of the
    failed rule names (empty string == keep). Thresholds are the
    module-level FILTER_* constants."""
    q = quality_score(docs)
    r = repetition_stats(docs).select("doc_id", "gopher_flagged")
    joined = q.join(r, "doc_id")
    rules = [
        (F.col("n_tokens") < FILTER_MIN_TOKENS, "too_few_tokens"),
        (F.col("n_tokens") > FILTER_MAX_TOKENS, "too_many_tokens"),
        (F.col("mean_token_len") < FILTER_MIN_MEAN_TOK, "mean_token_len_low"),
        (F.col("mean_token_len") > FILTER_MAX_MEAN_TOK, "mean_token_len_high"),
        (F.col("punct_ratio") > FILTER_MAX_PUNCT, "high_punct"),
        (F.col("stopword_ratio") < FILTER_MIN_STOPWORD, "low_stopword"),
        (F.col("gopher_flagged") == 1, "gopher_repetition"),
    ]
    reasons = F.array_join(
        F.filter(
            F.array(*[F.when(cond, F.lit(name)) for cond, name in rules]),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return joined.select(
        "doc_id",
        (reasons == F.lit("")).alias("keep"),
        reasons.alias("reasons"),
    )


def filter_pipeline_sql() -> str:
    rules = [
        (f"q.n_tokens < {FILTER_MIN_TOKENS}", "too_few_tokens"),
        (f"q.n_tokens > {FILTER_MAX_TOKENS}", "too_many_tokens"),
        (f"q.mean_token_len < {FILTER_MIN_MEAN_TOK}", "mean_token_len_low"),
        (f"q.mean_token_len > {FILTER_MAX_MEAN_TOK}", "mean_token_len_high"),
        (f"q.punct_ratio > {FILTER_MAX_PUNCT}", "high_punct"),
        (f"q.stopword_ratio < {FILTER_MIN_STOPWORD}", "low_stopword"),
        ("r.gopher_flagged = 1", "gopher_repetition"),
    ]
    cases = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for cond, name in rules
    )
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL
    reasons = (
        f"coalesce(array_to_string(list_filter([{cases}],"
        f" x -> x IS NOT NULL), ','), '')"
    )
    return f"""
SELECT q.doc_id,
       ({reasons} = '') AS keep,
       {reasons} AS reasons
FROM ({QUALITY_SCORE_SQL}) q
JOIN ({REPETITION_STATS_SQL}) r ON r.doc_id = q.doc_id
"""


# ---------------------------------------------------------------------------
# Corpus term statistics + Zipf fit
# ---------------------------------------------------------------------------
# The vocabulary-health report run before committing a tokenizer or a
# filter threshold at scale: top terms by collection frequency, and the
# Zipf log-log slope over the top ranks (natural text ~ -1; a slope far
# off flags boilerplate floods or tokenizer breakage). One tokenize
# pass, one groupBy with map-side combine, a distributed top-k; the
# slope is two covariance aggregates over top_k rows.

TERM_STATS_TOP_K = 100
ZIPF_FIT_RANKS = 1000


def term_stats(docs: DataFrame, top_k: int = TERM_STATS_TOP_K) -> DataFrame:
    """(term, cf, df, rank): top_k terms by collection frequency
    (ties on term asc)."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term")
    )
    agg = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    return (
        agg.orderBy(F.desc("cf"), F.asc("term")).limit(top_k)
        .withColumn("rank", F.row_number().over(w))
        .select("term", F.col("cf").cast("long").alias("cf"),
                F.col("df").cast("long").alias("df"), "rank")
    )


def zipf_fit(docs: DataFrame, ranks: int = ZIPF_FIT_RANKS) -> DataFrame:
    """One row (n_ranks, slope): OLS slope of log2(cf) on log2(rank)
    over the top `ranks` terms — the Zipf exponent (~ -1 for natural
    text). slope = covar_pop / var_pop, rounded to 6dp, computed with
    the identical decomposition in the SQL twin."""
    from pyspark.sql import Window

    tok = docs.select(F.explode(tokenize_expr(F.col("text"))).alias("term"))
    agg = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    top = (
        agg.orderBy(F.desc("cf"), F.asc("term")).limit(ranks)
        .withColumn("rank", F.row_number().over(w))
        .select(F.log2("rank").alias("x"), F.log2("cf").alias("y"))
    )
    return top.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("slope"),
    )


def term_stats_sql(top_k: int = TERM_STATS_TOP_K) -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_REP_TOKS}) AS term FROM documents),
agg AS (
  SELECT term, count(*)::bigint AS cf, count(DISTINCT doc_id)::bigint AS df
  FROM tok GROUP BY 1
)
SELECT term, cf, df,
       row_number() OVER (ORDER BY cf DESC, term ASC)::int AS rank
FROM agg ORDER BY cf DESC, term ASC LIMIT {top_k}
"""


def zipf_fit_sql(ranks: int = ZIPF_FIT_RANKS) -> str:
    return f"""
WITH tok AS (SELECT unnest({_REP_TOKS}) AS term FROM documents),
agg AS (SELECT term, count(*)::double AS cf FROM tok GROUP BY 1),
top AS (
  SELECT log2(row_number() OVER (ORDER BY cf DESC, term ASC)) AS x,
         log2(cf) AS y
  FROM agg ORDER BY cf DESC, term ASC LIMIT {ranks}
)
SELECT count(*)::bigint AS n_ranks,
       round(covar_pop(x, y) / var_pop(x), 6) AS slope
FROM top
"""


# ---------------------------------------------------------------------------
# Per-document TF-IDF keywords
# ---------------------------------------------------------------------------

KEYWORDS_PER_DOC = 5


def tfidf_keywords(docs: DataFrame, k: int = KEYWORDS_PER_DOC) -> DataFrame:
    """(doc_id, term, tfidf, rank): each document's top-k terms by
    tf * log2(N/df) (ties on term asc) — the document-tagging op used
    to route/cluster corpora before training. One tokenize pass; df is
    a map-side-combined groupBy; the per-doc top-k is a window
    partitioned by doc_id, so the ranking shuffles on the same key the
    tf aggregation already produced."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.count()
    scored = tf.join(df, "term").select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log2(F.lit(float(n)) / F.col("df")), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def tfidf_keywords_sql(k: int = KEYWORDS_PER_DOC) -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_REP_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::double AS df FROM tok GROUP BY 1),
n AS (SELECT count(*)::double AS n FROM documents),
scored AS (
  SELECT doc_id, term, round(tf * log2(n.n / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf,
       rank FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC)::int AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Per-document unigram-LM cross-entropy / perplexity
# ---------------------------------------------------------------------------

def doc_perplexity(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity): each document's
    cross-entropy under the collection's unigram MLE distribution
    p_c(w) = cf(w)/C — the in-corpus analogue of the KenLM perplexity
    quality filter of CCNet (Wenzek et al., LREC 2020): docs far from
    the corpus distribution (boilerplate, non-text, other-language)
    score high. No smoothing needed: every token's term exists in the
    collection by construction.

        H(d) = -(1/|d|) * sum_w tf(w,d) * log2 p_c(w)
             = log2(C) - (1/|d|) * sum_w tf(w,d) * log2 cf(w)
        perplexity = 2^H

    100 TB shape: one (doc_id, term, tf) aggregation, one join against
    the vocabulary-sized cf relation (post-dedup — the join input is
    distinct (doc, term) pairs, not raw tokens), one per-doc sum; the
    collection total rides a broadcast 1-row frame. Zero-token docs
    have no distribution and are excluded (the upstream filter's
    problem, as in CCNet). Rounded to 6dp for the oracle twin."""
    tok = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term")
    )
    dtf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = dtf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").cast("double").alias("c_total"))
    per = (
        dtf.join(cf, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.log2(F.col("cf").cast("double"))).alias("slc"),
        )
    )
    h = F.log2(F.col("c_total")) - F.col("slc") / F.col("n_tokens")
    return per.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        F.round(h, 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("perplexity"),
    )


DOC_PERPLEXITY_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_REP_TOKS}) AS term FROM documents),
dtf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok GROUP BY 1, 2),
cf AS (SELECT term, sum(tf) AS cf FROM dtf GROUP BY 1),
tot AS (SELECT sum(cf)::double AS c_total FROM cf),
per AS (
  SELECT dtf.doc_id, sum(dtf.tf)::bigint AS n_tokens,
         sum(dtf.tf * log2(cf.cf)) AS slc
  FROM dtf JOIN cf USING (term) GROUP BY 1
)
SELECT doc_id, n_tokens,
       round(log2(tot.c_total) - slc / n_tokens, 6) AS cross_entropy,
       round(pow(2.0, log2(tot.c_total) - slc / n_tokens), 6) AS perplexity
FROM per CROSS JOIN tot
"""


def doc_perplexity_bigram(docs: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(doc_id, n_bigrams, cross_entropy, perplexity): per-document
    cross-entropy under the collection's additive-smoothed BIGRAM
    language model — the order-2 upgrade of doc_perplexity's unigram
    filter (the KenLM-perplexity quality-filter role of CCNet, Wenzek
    et al. LREC 2020, which uses a 5-gram model; bigrams are where the
    word-order signal starts and stay relational):

        P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 .) + alpha * V)
        H(d)     = -(1/B_d) * sum over adjacent pairs log2 P(w2|w1)

    with c(.) corpus bigram counts, c(w1 .) the left-context total,
    V the distinct unigram vocabulary size, B_d the doc's bigram count
    (tokens - 1). Smoothing is required (unlike the unigram filter) —
    a doc's bigram may be unique to it, but never absent from the
    corpus it is counted into, so alpha only shifts, never rescues, a
    zero. Docs with < 2 tokens have no bigram distribution and are
    excluded (the unigram filter covers them).

    100 TB shape: bigrams come from one zip_with over the token array
    (no positional self-join); one (doc, bigram, tf) aggregation, one
    corpus-bigram-count join on the key that aggregation already
    produced, one broadcast left-context relation join, V and nothing
    else on a broadcast 1-row frame; two shuffles total. Rounded 6dp
    for the oracle twin."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smoothing): {alpha}")
    toks = tokenize_expr(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b_: F.concat_ws(" ", a, b_),
    )
    big = docs.where(n >= 2).select(
        "doc_id", F.explode(bigrams).alias("bg")
    )
    dtf = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("tf"))
    c12 = dtf.groupBy("bg").agg(F.sum("tf").alias("c12"))
    c1 = (
        c12.withColumn("w1", F.split(F.col("bg"), " ", 2).getItem(0))
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    vocab = docs.select(
        F.explode(tokenize_expr(F.col("text"))).alias("term")
    ).agg(F.countDistinct("term").cast("double").alias("v"))
    rows = (
        dtf.join(c12, "bg")
        .withColumn("w1", F.split(F.col("bg"), " ", 2).getItem(0))
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "tf",
            F.log2(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    per = rows.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        (-F.sum(F.col("tf") * F.col("lp")) / F.sum("tf")).alias("h"),
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("h"), 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.col("h")), 6).alias("perplexity"),
    )


def doc_perplexity_bigram_sql(alpha: float = 0.5) -> str:
    """DuckDB twin of doc_perplexity_bigram."""
    return f"""
WITH base AS (
  SELECT doc_id, {_REP_TOKS} AS toks FROM documents
), big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM base WHERE len(toks) >= 2
), dtf AS (
  SELECT doc_id, bg, count(*)::double AS tf FROM big GROUP BY 1, 2
), c12 AS (
  SELECT bg, sum(tf) AS c12 FROM dtf GROUP BY 1
), c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT term)::double AS v
  FROM (SELECT unnest({_REP_TOKS}) AS term FROM documents)
), per AS (
  SELECT dtf.doc_id,
         sum(dtf.tf)::bigint AS n_bigrams,
         -sum(dtf.tf * log2((c12.c12 + {alpha})
                            / (c1.c1 + {alpha} * vocab.v))) / sum(dtf.tf) AS h
  FROM dtf
  JOIN c12 USING (bg)
  JOIN c1 ON c1.w1 = split_part(dtf.bg, ' ', 1)
  CROSS JOIN vocab
  GROUP BY 1
)
SELECT doc_id, n_bigrams,
       round(h, 6) AS cross_entropy,
       round(pow(2.0, h), 6) AS perplexity
FROM per
"""
