"""Tokenization — owned by our engine (the reference delegates it to
Terrier core's termpipelines, EFSetupTest.java:106-107; ours must be a
pluggable pure function per SURVEY.md §2.1).

The default tokenizer is a pure Catalyst expression (JVM-side, inside
whole-stage codegen — faster than any Python UDF) with an exact ANSI-SQL
equivalent for the DuckDB oracle: lowercase, split on runs of
non-alphanumeric characters, drop empty strings. No stemming for source
code.

A code-aware variant (camelCase / snake_case splitting) is provided as a
vectorized Arrow pandas UDF for corpora where identifier sub-tokens
matter; it is pluggable via TOKENIZERS.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize_expr(content: Column) -> Column:
    """Catalyst-expression tokenizer: array of non-empty lowercase tokens."""
    return F.filter(
        F.split(F.lower(content), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def tokenize_sql_duckdb(col: str) -> str:
    """The DuckDB-SQL twin of tokenize_expr, for oracle queries."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_RE}'),"
        " x -> x <> '')"
    )


_CAMEL_RE = r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code_udf(content: pd.Series) -> pd.Series:
    """Code-aware tokenizer (Arrow-vectorized, no per-row Python loop):
    splits camelCase/snake_case identifiers before the standard split."""
    expanded = content.fillna("").str.replace(_CAMEL_RE, " ", regex=True)
    toks = expanded.str.lower().str.split(TOKEN_SPLIT_RE, regex=True)
    return toks.map(lambda xs: [x for x in xs if x])


def tokenize_code_sql_duckdb(col: str) -> str:
    """The DuckDB twin of tokenize_code_udf. RE2 has no lookarounds,
    so the camel boundaries are re-expressed as two sequential
    capture-group replacements — a DIFFERENT formulation that must
    produce the same split points: rule 1 breaks lower/digit->Upper
    ('parseJSON' -> 'parse JSON'), rule 2 breaks an acronym's last
    capital from a following word ('HTTPServer' -> 'HTTP Server').
    Sequential global non-overlapping replaces insert a break at every
    boundary the lookaround alternation finds (boundaries two apart
    never share a consumed character; the two rules never destroy each
    other's matches because an inserted space only lands where a split
    already happens). Agreement is enforced by the contract hash over
    adversarial identifiers and by the unit mirror."""
    r1 = f"regexp_replace({col}, '([a-z0-9])([A-Z])', '\\1 \\2', 'g')"
    r2 = f"regexp_replace({r1}, '([A-Z])([A-Z][a-z])', '\\1 \\2', 'g')"
    return (
        f"list_filter(regexp_split_to_array(lower({r2}),"
        f" '{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


def make_tokenizer(
    base: str = "simple",
    stopwords: list[str] | None = None,
    max_term_length: int | None = None,
    stemmer: str | None = None,
):
    """Compose a term pipeline from a base tokenizer + optional stopword
    removal + term-length truncation + optional stemmer — the role of
    Terrier's configurable termpipelines (the reference test pipeline is
    `Stopwords,PorterStemmer`, EFSetupTest.java:106-107) and
    MAX_TERM_LENGTH (util/IndexUtil.java:34, Generator.java:281).

    Everything except the stemmer is a pure Catalyst expression
    (JVM-side); the stemmer stage (stemmer='porter') is an
    Arrow-vectorized pandas UDF with a per-batch vocabulary memo,
    applied AFTER stopword removal (reference pipeline order).

    base='terrier' is the packaged reference-parity preset: the simple
    tokenizer + the standard 733-word Terrier stopword list
    (stopwords.TERRIER_STOPWORDS, the role of the reference's
    stopword-list.txt) + Porter — i.e. `Stopwords,PorterStemmer` as a
    one-word pipeline name. Explicit stopwords/stemmer arguments
    override the preset's defaults."""
    if base == "terrier":
        base = "simple"
        if stopwords is None:
            from terrier_ef_spark.stopwords import TERRIER_STOPWORDS

            stopwords = list(TERRIER_STOPWORDS)
        if stemmer is None:
            stemmer = "porter"
    base_fn = TOKENIZERS[base] if isinstance(base, str) else base
    if stemmer not in (None, "porter"):
        raise ValueError(f"unknown stemmer {stemmer!r}")

    def tok(col: Column) -> Column:
        t = base_fn(col)
        if max_term_length is not None:
            t = F.transform(t, lambda x: F.substring(x, 1, max_term_length))
        if stopwords:
            sw = F.array(*[F.lit(w) for w in stopwords])
            t = F.filter(t, lambda x: ~F.array_contains(sw, x))
        if stemmer == "porter":
            from terrier_ef_spark.stemmer import porter_stem_tokens

            t = porter_stem_tokens(t)
        return t

    return tok


TOKENIZERS = {
    "simple": tokenize_expr,
    "code": lambda col: tokenize_code_udf(col),
}


def tokenize_query(index, text: str) -> list[str]:
    """Apply an index's RECORDED term pipeline (params.json: tokenizer,
    stopwords, max_term_length) to one raw query string, driver-side —
    so raw queries match what was indexed (Terrier's rule that queries
    and documents share the termpipeline). Scalar mirror of
    make_tokenizer for the serving entry points; per-query cost is a
    few string ops, never a Spark job. Dedups repeated terms — use
    tokenize_query_weighted when qtf weighting matters."""
    return list(dict.fromkeys(_tokenize_query_raw(index, text)))


def tokenize_query_weighted(
    index, text: str
) -> tuple[list[str], dict[str, float]]:
    """tokenize_query plus query-term-frequency weights: Terrier's
    matching aggregates a repeated query term with qtf weight
    (MatchingQueryTerms sums per-occurrence weights), so "spark spark
    sql" scores the `spark` contribution twice. Returns (distinct terms
    in first-seen order, {term: occurrences}) with weight-1 terms
    omitted from the mapping; feed it to run_queries via q['weights']
    (every pruning bound stays valid for w > 0)."""
    toks = _tokenize_query_raw(index, text)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return list(counts), {t: float(c) for t, c in counts.items() if c > 1}


def _tokenize_query_raw(index, text: str) -> list[str]:
    """The recorded pipeline WITHOUT the final dedup (per-occurrence)."""
    import json
    import os
    import re

    with open(os.path.join(index.paths.root, "params.json")) as fh:
        params = json.load(fh)
    base = params.get("tokenizer", "simple")
    stopwords = params.get("stopwords")
    max_len = params.get("max_term_length")
    stemmer = None
    if base == "terrier":
        if stopwords is None:
            from terrier_ef_spark.stopwords import TERRIER_STOPWORDS

            stopwords = list(TERRIER_STOPWORDS)
        stemmer = "porter"
    if base == "code":
        text = re.sub(_CAMEL_RE, " ", text)
    elif base == "pruned":
        # pruned/imported indexes record a synthetic pipeline name;
        # the simple tokenizer is the right default for raw queries
        pass
    elif str(base).startswith("trigram"):
        # a trigram (substring-search) index has no word-term pipeline;
        # silently tokenizing words against a trigram lexicon would
        # "work" and return garbage rankings — fail with the right door
        raise ValueError(
            "this index was built with the trigram (substring-search) "
            "tokenizer; word queries don't apply — use substring_search/"
            "regex_search (query/substring.py) or submit_query --grep"
        )
    toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
    if max_len is not None:
        toks = [t[:max_len] for t in toks]
    if stopwords:
        sw = set(stopwords)
        toks = [t for t in toks if t not in sw]
    if stemmer == "porter":
        from terrier_ef_spark.stemmer import porter_stem

        toks = [porter_stem(t) for t in toks]
    return toks
