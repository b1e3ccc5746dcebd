"""Bo1 pseudo-relevance-feedback query expansion (DFR framework).

Terrier's QueryExpansion role: terrier-ef users run Bo1 expansion on
top of the EF inverted index plus the Invert2Direct forward index (the
direct index exists for exactly this workflow — reference:
Invert2Direct.java builds it as a standalone tool). Published model:
Amati's Bo1 (Bose-Einstein 1) information weight

    w(t) = tfx * log2((1 + Pn) / Pn) + log2(1 + Pn),   Pn = cf(t) / N

where tfx is t's frequency summed over the top `fb_docs` pseudo-
relevant documents. The reformulated query weights each term

    qtw(t) = qtf(t) / qtf_max + w(t) / w_max

(original-only terms keep the first part, expansion-only terms the
second) and re-runs via run_queries' term^w support.

Spark shape: the first pass is any run_queries strategy; candidate
gathering decodes ONLY the fb docids from the direct index (docid
filter pushed to the docid-range-sorted parquet), aggregates
(qid, termid, tfx) relationally, joins the lexicon for cf, and only
the final (queries x fb_terms) selection is collected to the driver to
build the second-pass query set. Every float that feeds a selection or
a weight is rounded to 6dp so the DuckDB oracle twin reproduces the
expansion bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from terrier_ef_spark.index.direct import decode_direct
from terrier_ef_spark.index.reader import EFIndex
from terrier_ef_spark.query.engine import run_queries


def bo1_term_weights(
    index: EFIndex,
    first_pass: list[tuple[int, int]],
    direct: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, w): Bo1 information weight of every term occurring
    in the pseudo-relevant docs. `first_pass` is the collected
    [(qid, docid)] feedback set (bounded: queries x fb_docs rows)."""
    spark = index.spark
    num_docs = float(index.stats["num_docs"])
    fb = spark.createDataFrame(first_pass, "qid long, docid long")
    fb_docids = sorted({d for _, d in first_pass})

    if direct is None:
        direct = spark.read.parquet(f"{index.paths.root}/direct")
    dd = decode_direct(index, direct.where(F.col("docid").isin(fb_docids)))
    cand = (
        dd.join(F.broadcast(fb), "docid")
        .groupBy("qid", "termid")
        .agg(F.sum("tf").alias("tfx"))
    )
    # lexicon side is the big relation at scale; the candidate side is
    # bounded by fb_docs x doc vocabulary — AQE broadcasts it
    lex = index.lexicon.select("termid", "term", F.col("cf").cast("double").alias("cf"))
    pn = F.col("cf") / F.lit(num_docs)
    w = F.col("tfx").cast("double") * F.log2((1 + pn) / pn) + F.log2(1 + pn)
    return cand.join(lex, "termid").select(
        "qid", "term", F.round(w, 6).alias("w")
    )


def kl_term_weights(
    index: EFIndex,
    first_pass: list[tuple[int, int]],
    direct: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, w): Kullback-Leibler divergence expansion weight
    (Amati's DFR framework; Terrier's KL model — the other standard
    Terrier PRF model next to Bo1):

        w(t) = f * log2(f / p),  f = tfx / fb_len(q),  p = cf / C

    where fb_len(q) is the total token length of q's feedback docs and
    C the collection token count; terms with f <= p score 0."""
    spark = index.spark
    num_tokens = float(index.stats["num_tokens"])
    fb = spark.createDataFrame(first_pass, "qid long, docid long")
    fb_docids = sorted({d for _, d in first_pass})

    if direct is None:
        direct = spark.read.parquet(f"{index.paths.root}/direct")
    dd = decode_direct(index, direct.where(F.col("docid").isin(fb_docids)))
    # per-query feedback length: bounded rows (queries x fb_docs)
    fb_len = (
        fb.join(
            index.docs.select("docid", F.col("doclen").cast("double").alias("dl")),
            "docid",
        )
        .groupBy("qid")
        .agg(F.sum("dl").alias("fb_len"))
    )
    cand = (
        dd.join(F.broadcast(fb), "docid")
        .groupBy("qid", "termid")
        .agg(F.sum("tf").alias("tfx"))
        .join(F.broadcast(fb_len), "qid")
    )
    lex = index.lexicon.select("termid", "term", F.col("cf").cast("double").alias("cf"))
    f = F.col("tfx").cast("double") / F.col("fb_len")
    p = F.col("cf") / F.lit(num_tokens)
    w = F.when(f > p, f * F.log2(f / p)).otherwise(F.lit(0.0))
    return cand.join(lex, "termid").select(
        "qid", "term", F.round(w, 6).alias("w")
    )


def bo2_term_weights(
    index: EFIndex,
    first_pass: list[tuple[int, int]],
    direct: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, w): Bo2 information weight (Amati's Bose-Einstein 2
    — Terrier's third standard expansion model next to Bo1 and KL).
    Same Bose-Einstein form as Bo1 but with the token-based prior:

        w(t) = tfx * log2((1 + f) / f) + log2(1 + f),
        f = cf * fb_len(q) / C

    i.e. the expected frequency of t in q's feedback set (fb_len
    tokens) under the collection token distribution (C tokens), where
    Bo1 uses the per-document prior cf / N."""
    spark = index.spark
    num_tokens = float(index.stats["num_tokens"])
    fb = spark.createDataFrame(first_pass, "qid long, docid long")
    fb_docids = sorted({d for _, d in first_pass})

    if direct is None:
        direct = spark.read.parquet(f"{index.paths.root}/direct")
    dd = decode_direct(index, direct.where(F.col("docid").isin(fb_docids)))
    fb_len = (
        fb.join(
            index.docs.select("docid", F.col("doclen").cast("double").alias("dl")),
            "docid",
        )
        .groupBy("qid")
        .agg(F.sum("dl").alias("fb_len"))
    )
    cand = (
        dd.join(F.broadcast(fb), "docid")
        .groupBy("qid", "termid")
        .agg(F.sum("tf").alias("tfx"))
        .join(F.broadcast(fb_len), "qid")
    )
    lex = index.lexicon.select("termid", "term", F.col("cf").cast("double").alias("cf"))
    fr = F.col("cf") * F.col("fb_len") / F.lit(num_tokens)
    w = F.col("tfx").cast("double") * F.log2((1 + fr) / fr) + F.log2(1 + fr)
    return cand.join(lex, "termid").select(
        "qid", "term", F.round(w, 6).alias("w")
    )


_WEIGHT_MODELS = {"bo1": bo1_term_weights, "bo2": bo2_term_weights,
                  "kl": kl_term_weights}


def expand_queries(
    index: EFIndex,
    queries: list[dict],
    first_pass: list[tuple[int, int]],
    *,
    model: str = "bo1",
    fb_terms: int = 10,
    direct: DataFrame | None = None,
) -> list[dict]:
    """Reformulate `queries` (disjunctive) with expansion terms from
    the given feedback set, using `model` term weights ('bo1' | 'bo2' | 'kl';
    the qtw combination qtf/qtf_max + w/w_max is Terrier's shared
    ExpansionTerms discipline for every DFR expansion model). Returns
    new query dicts with 6dp-rounded term weights; queries with an
    empty feedback set pass through unchanged."""
    wdf = _WEIGHT_MODELS[model](index, first_pass, direct=direct)
    rk = Window.partitionBy("qid").orderBy(F.desc("w"), F.asc("term"))
    sel = (
        wdf.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= fb_terms)
        .collect()
    )
    by_qid: dict[int, list[tuple[str, float]]] = {}
    for r in sel:
        by_qid.setdefault(int(r["qid"]), []).append((r["term"], float(r["w"])))

    out = []
    for q in queries:
        qid = int(q["qid"])
        orig = list(dict.fromkeys(q["terms"]))
        qtf = {t: float((q.get("weights") or {}).get(t, 1.0)) for t in orig}
        qtf_max = max(qtf.values())
        chosen = by_qid.get(qid, [])
        if not chosen:
            out.append(dict(q))
            continue
        w_max = max(w for _, w in chosen)
        weights = {t: v / qtf_max for t, v in qtf.items()}
        for t, w in chosen:
            weights[t] = weights.get(t, 0.0) + w / w_max
        weights = {t: round(v, 6) for t, v in weights.items()}
        nq = dict(q)  # preserve per-query extras (e.g. a 'k' override)
        nq.update(
            terms=sorted(weights), mode="disjunctive", weights=weights
        )
        out.append(nq)
    return out


def expand_queries_bo1(
    index: EFIndex,
    queries: list[dict],
    first_pass: list[tuple[int, int]],
    *,
    fb_terms: int = 10,
    direct: DataFrame | None = None,
) -> list[dict]:
    return expand_queries(
        index, queries, first_pass, model="bo1", fb_terms=fb_terms, direct=direct
    )


def run_queries_prf(
    index: EFIndex,
    queries: list[dict],
    *,
    model: str = "bo1",
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 10,
    strategy: str = "auto",
    direct: DataFrame | None = None,
) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval: BM25 top-fb_docs
    feedback (deterministic 6dp/docid selection so reformulation is
    reproducible), `model` expansion (bo1 | bo2 | kl), weighted second pass.
    Returns (qid, rank, docid, score)."""
    if any(q.get("mode", "disjunctive") == "conjunctive" for q in queries):
        raise ValueError(
            "PRF expansion is defined for ranked (disjunctive) retrieval; "
            "expanding a conjunctive query would silently change its AND "
            "semantics"
        )
    deep = run_queries(index, queries, k=max(fb_docs, 100), strategy=strategy)
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid")
    )
    fb_rows = (
        deep.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= fb_docs)
        .select("qid", "docid")
        .collect()
    )
    first_pass = [(int(r["qid"]), int(r["docid"])) for r in fb_rows]
    if not first_pass:
        return run_queries(index, queries, k=k, strategy=strategy)
    expanded = expand_queries(
        index, queries, first_pass, model=model, fb_terms=fb_terms, direct=direct
    )
    return run_queries(index, expanded, k=k, strategy=strategy)


def run_queries_bo1(index: EFIndex, queries: list[dict], **kw) -> DataFrame:
    return run_queries_prf(index, queries, model="bo1", **kw)


def rm3_term_weights(
    index: EFIndex,
    first_pass_scored: list[tuple[int, int, float]],
    direct: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, w): UNNORMALIZED RM1 relevance-model weights
    (Lavrenko & Croft SIGIR'01) from a scored feedback set
    [(qid, docid, score6)]:

        w(t) = sum over feedback docs D of  score6(D) * tf(t, D) / |D|

    i.e. P(t|R) with the first-pass score as the (unnormalized)
    document weight and the MLE P(t|D) = tf/dl — the shape Anserini's
    RM3 uses with the searcher's own scores. The per-query score-sum
    normalization is deliberately NOT applied here: run_queries_rm3
    divides each selected weight by the selected set's total, and the
    score-sum factor cancels in that ratio — keeping every division
    out of the accumulation-order-sensitive path. Weights are rounded
    to 6dp so the selection is reproducible across engines."""
    spark = index.spark
    fb = spark.createDataFrame(
        first_pass_scored, "qid long, docid long, s double"
    )
    fb_docids = sorted({d for _, d, _ in first_pass_scored})

    if direct is None:
        direct = spark.read.parquet(f"{index.paths.root}/direct")
    dd = decode_direct(index, direct.where(F.col("docid").isin(fb_docids)))
    cand = (
        dd.join(
            index.docs.select("docid", F.col("doclen").cast("double").alias("dl")),
            "docid",
        )
        .join(F.broadcast(fb), "docid")
        .groupBy("qid", "termid")
        .agg(F.sum(F.col("s") * F.col("tf").cast("double") / F.col("dl")).alias("w"))
    )
    lex = index.lexicon.select("termid", "term")
    return cand.join(lex, "termid").select(
        "qid", "term", F.round("w", 6).alias("w")
    )


def run_queries_rm3(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 10,
    alpha: float = 0.5,
    strategy: str = "auto",
    direct: DataFrame | None = None,
) -> DataFrame:
    """RM3 pseudo-relevance feedback (Abdul-Jaleel et al., TREC 2004
    — the interpolated relevance model, pt/Anserini's standard PRF):
    BM25 top-fb_docs feedback (deterministic 6dp/docid selection),
    RM1 term weights from the feedback docs' MLE term distributions
    weighted by their first-pass scores, top fb_terms selected and
    renormalized to a distribution, then interpolated with the
    original query's qtf distribution:

        qtw(t) = alpha * qtf(t)/sum(qtf) + (1-alpha) * rm1'(t)

    and re-run as a weighted disjunctive second pass. Companion to the
    DFR expansion family (Bo1/Bo2/KL) on the same two-pass pipeline;
    assumes non-negative first-pass scores (as RM3 implementations do
    — with a negative-idf feedback doc the mixture can degenerate).
    Returns (qid, rank, docid, score)."""
    if any(q.get("mode", "disjunctive") == "conjunctive" for q in queries):
        raise ValueError(
            "PRF expansion is defined for ranked (disjunctive) retrieval; "
            "expanding a conjunctive query would silently change its AND "
            "semantics"
        )
    deep = run_queries(index, queries, k=max(fb_docs, 100), strategy=strategy)
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid")
    )
    fb_rows = (
        deep.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= fb_docs)
        .select("qid", "docid", F.round("score", 6).alias("s"))
        .collect()
    )
    first_pass = [
        (int(r["qid"]), int(r["docid"]), float(r["s"])) for r in fb_rows
    ]
    if not first_pass:
        return run_queries(index, queries, k=k, strategy=strategy)

    wdf = rm3_term_weights(index, first_pass, direct=direct)
    rk = Window.partitionBy("qid").orderBy(F.desc("w"), F.asc("term"))
    sel = (
        wdf.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= fb_terms)
        .collect()
    )
    by_qid: dict[int, list[tuple[str, float]]] = {}
    for r in sel:
        by_qid.setdefault(int(r["qid"]), []).append((r["term"], float(r["w"])))

    out = []
    for q in queries:
        qid = int(q["qid"])
        orig = list(dict.fromkeys(q["terms"]))
        qtf = {t: float((q.get("weights") or {}).get(t, 1.0)) for t in orig}
        qtf_sum = sum(qtf.values())
        chosen = by_qid.get(qid, [])
        w_sum = sum(w for _, w in sorted(chosen))  # fixed order
        if not chosen or w_sum == 0.0:
            out.append(dict(q))
            continue
        weights = {t: alpha * v / qtf_sum for t, v in qtf.items()}
        for t, wv in chosen:
            weights[t] = weights.get(t, 0.0) + (1 - alpha) * wv / w_sum
        weights = {t: round(v, 6) for t, v in weights.items()}
        nq = dict(q)
        nq.update(terms=sorted(weights), mode="disjunctive", weights=weights)
        out.append(nq)
    return run_queries(index, out, k=k, strategy=strategy)


def bo1_weight(tfx: float, cf: float, num_docs: float) -> float:
    """Scalar Bo1 weight (test oracle helper)."""
    pn = cf / num_docs
    return tfx * math.log2((1 + pn) / pn) + math.log2(1 + pn)


def bo2_weight(tfx: float, fb_len: float, cf: float, num_tokens: float) -> float:
    """Scalar Bo2 weight (test oracle helper)."""
    import math

    f = cf * fb_len / num_tokens
    return tfx * math.log2((1 + f) / f) + math.log2(1 + f)


def kl_weight(tfx: float, fb_len: float, cf: float, num_tokens: float) -> float:
    """Scalar KL weight (test oracle helper)."""
    f, p = tfx / fb_len, cf / num_tokens
    return f * math.log2(f / p) if f > p else 0.0


# ---------------------------------------------------------------------------
# Prefix (wildcard) queries — multi-term rewrite
# ---------------------------------------------------------------------------

def expand_prefix(index: EFIndex, prefix: str, max_expansions: int = 50) -> list[str]:
    """Lexicon terms starting with `prefix`, most-frequent-first
    (df desc, term asc), capped at max_expansions — Lucene's
    PrefixQuery rewrite discipline. The startswith filter pushes to the
    term-range-sorted lexicon parquet, so only the prefix's row groups
    are read; the collect is bounded by max_expansions (same
    driver-side discipline as the PRF term selection above)."""
    if not prefix:
        raise ValueError("empty prefix would expand the whole lexicon")
    rows = (
        index.lexicon.where(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def run_queries_prefix(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    max_expansions: int = 50,
) -> DataFrame:
    """queries: [{'qid': int, 'prefix': str}] — each prefix rewrites to
    a disjunctive BM25 query over its matching terms (weight 1 each,
    Lucene constant-score-boolean semantics with BM25 scoring); runs on
    the term-major scorer. Prefixes matching nothing return no rows for
    that qid."""
    expanded = []
    for q in queries:
        terms = expand_prefix(index, q["prefix"], max_expansions)
        if terms:
            expanded.append(
                {"qid": q["qid"], "terms": terms, "mode": "disjunctive"}
            )
    from terrier_ef_spark.query.engine import run_queries

    if not expanded:
        from terrier_ef_spark.query.engine import RESULT_SCHEMA

        return index.spark.createDataFrame([], RESULT_SCHEMA)
    return run_queries(index, expanded, k=k, strategy="term_major")


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance-1) term queries — SymSpell-style
# ---------------------------------------------------------------------------

def expand_fuzzy(index: EFIndex, term: str, max_expansions: int = 10) -> list[str]:
    """Lexicon terms within Levenshtein distance 1 of `term`,
    most-frequent-first (df desc, term asc), capped at max_expansions.

    Candidate generation is the SymSpell deletion-neighborhood trick
    (Garbe's symspell; the delete-match completeness argument for
    distance 1: equal terms match trivially, a substitution matches on
    same-position deletes, a deletion matches the query's delete
    against the term itself, an insertion matches the term's delete
    against the query): the lexicon side explodes each term into
    {term} U single-deletes and equi-matches the query's variant set —
    at a 10^9-term lexicon this is a JOIN against a materialized
    neighborhood table instead of a full-lexicon distance scan. A
    length +-1 prefilter bounds the explode and an exact levenshtein
    verify removes the trick's distance-2 false positives (e.g.
    'ab'~'ba')."""
    if not term:
        raise ValueError("empty term")
    qvars = [term] + [term[:i] + term[i + 1:] for i in range(len(term))]
    deletes = F.transform(
        F.sequence(F.lit(1), F.length("term")),
        lambda i: F.concat(
            F.col("term").substr(F.lit(1), i - 1),
            F.col("term").substr(i + 1, F.length("term") - i),
        ),
    )
    rows = (
        index.lexicon.select("term", "df")
        .where(F.abs(F.length("term") - len(term)) <= 1)
        .withColumn(
            "variant",
            F.explode(F.array_union(F.array(F.col("term")), deletes)),
        )
        .where(F.col("variant").isin(qvars))
        .where(F.levenshtein(F.col("term"), F.lit(term)) <= 1)
        .select("term", "df")
        .distinct()
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    return [r["term"] for r in rows]


def run_queries_fuzzy(
    index: EFIndex,
    queries: list[dict],
    *,
    k: int = 10,
    max_expansions: int = 10,
) -> DataFrame:
    """queries: [{'qid': int, 'term': str}] — each (possibly
    misspelled) term rewrites to a disjunctive BM25 query over its
    edit-distance-1 lexicon matches (weight 1 each)."""
    expanded = []
    for q in queries:
        terms = expand_fuzzy(index, q["term"], max_expansions)
        if terms:
            expanded.append(
                {"qid": q["qid"], "terms": terms, "mode": "disjunctive"}
            )
    from terrier_ef_spark.query.engine import RESULT_SCHEMA, run_queries

    if not expanded:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    return run_queries(index, expanded, k=k, strategy="term_major")


# ---------------------------------------------------------------------------
# "Did you mean" spelling suggestions — batched DirectSpellChecker role
# ---------------------------------------------------------------------------

def suggest_corrections(
    index: EFIndex,
    queries: list[dict],
    *,
    n_suggest: int = 5,
    max_df_known: int = 0,
) -> DataFrame:
    """Batched "did you mean" over the index vocabulary (the
    Lucene/Solr DirectSpellChecker role): for every query term whose
    df <= max_df_known (default 0: absent from the lexicon), rank its
    Levenshtein-distance-1 vocabulary neighbours most-frequent-first.

    queries: [{'qid': int, 'terms': [str, ...]}]. Returns one row per
    suggestion: (qid, term, rank, suggestion, df) with rank 1..n_suggest
    by (df desc, suggestion asc). Terms the lexicon already knows (df >
    max_df_known) produce no rows — they need no correction.

    Scale shape: the whole batch is served by ONE lexicon pass, unlike
    expand_fuzzy's per-term driver loop. The query side is a broadcast
    literal frame of (qid, term, variant) deletion neighbourhoods
    (O(sum of term lengths) rows, driver-built); the lexicon side
    explodes each term into {term} U single-deletes AFTER a pushed
    length-window prefilter (within +-1 of some query term's length),
    equi-joins the variants (the SymSpell completeness argument in
    expand_fuzzy's docstring), then an exact levenshtein verify drops
    the trick's distance-2 false positives. At a 10^9-term lexicon this
    is a pruned scan + broadcast hash join, never a full-vocabulary
    distance scan per term.
    """
    if n_suggest < 1:
        raise ValueError(f"n_suggest must be >= 1: {n_suggest}")
    spark = index.spark
    pairs = [
        (int(q["qid"]), t)
        for q in queries
        for t in dict.fromkeys(q["terms"])
        if t
    ]
    if not pairs:
        raise ValueError("no non-empty query terms")
    var_rows = [
        (qid, t, v)
        for qid, t in pairs
        for v in dict.fromkeys([t] + [t[:i] + t[i + 1:] for i in range(len(t))])
    ]
    qvars = spark.createDataFrame(
        var_rows, "qid long, term string, variant string"
    )
    qterms = spark.createDataFrame(pairs, "qid long, term string")
    lengths = sorted({len(t) for _, t in pairs})
    lo, hi = lengths[0] - 1, lengths[-1] + 1

    # terms the lexicon already knows need no correction
    known = (
        qterms.join(
            index.lexicon.select("term", "df"), "term", "left"
        )
        .where(F.coalesce(F.col("df"), F.lit(0)) > max_df_known)
        .select("qid", "term")
    )
    unknown = qterms.join(known, ["qid", "term"], "left_anti")

    deletes = F.transform(
        F.sequence(F.lit(1), F.length("suggestion")),
        lambda i: F.concat(
            F.col("suggestion").substr(F.lit(1), i - 1),
            F.col("suggestion").substr(i + 1, F.length("suggestion") - i),
        ),
    )
    lex = (
        index.lexicon.select(
            F.col("term").alias("suggestion"), F.col("df").cast("long").alias("df")
        )
        .where(F.length("suggestion").between(lo, hi))
        .withColumn(
            "variant",
            F.explode(
                F.array_union(F.array(F.col("suggestion")), deletes)
            ),
        )
    )
    cands = (
        lex.join(F.broadcast(qvars), "variant")
        .join(F.broadcast(unknown), ["qid", "term"], "left_semi")
        .where(F.col("suggestion") != F.col("term"))
        .where(F.levenshtein(F.col("suggestion"), F.col("term")) <= 1)
        .select("qid", "term", "suggestion", "df")
        .distinct()
    )
    w = Window.partitionBy("qid", "term").orderBy(
        F.desc("df"), F.asc("suggestion")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_suggest)
        .select("qid", "term", "rank", "suggestion", "df")
    )


# ---------------------------------------------------------------------------
# More-like-this — query-by-document (Lucene MoreLikeThis role)
# ---------------------------------------------------------------------------

def more_like_this_terms(
    index: EFIndex,
    doc_queries: list[dict],
    *,
    max_terms: int = 10,
    direct: DataFrame | None = None,
) -> list[dict]:
    """Turn source documents into queries (the Lucene MoreLikeThis
    role): each doc's terms are gathered from the DIRECT index (docid
    filter pushed to the range-sorted parquet — the PRF gathering
    path), ranked by tf-idf w = tf * log2(N/df) (6dp, ties term asc),
    and the top max_terms become an unweighted disjunctive query.

    doc_queries: [{'qid': int, 'docid': int}]. Returns engine query
    dicts; a qid whose source docid is absent from the index yields no
    query (no terms to like). Terms are unweighted — Lucene's optional
    boost-by-score variant is deliberately not applied so the second
    pass is plain BM25 over the selected vocabulary."""
    if max_terms < 1:
        raise ValueError(f"max_terms must be >= 1: {max_terms}")
    pairs = [(int(q["qid"]), int(q["docid"])) for q in doc_queries]
    if not pairs:
        raise ValueError("no doc queries")
    spark = index.spark
    qd = spark.createDataFrame(pairs, "qid long, docid long")
    docids = sorted({d for _, d in pairs})
    if direct is None:
        direct = spark.read.parquet(f"{index.paths.root}/direct")
    dd = decode_direct(index, direct.where(F.col("docid").isin(docids)))
    num_docs = float(index.stats["num_docs"])
    lex = index.lexicon.select(
        "termid", "term", F.col("df").cast("double").alias("df")
    )
    w = F.col("tf").cast("double") * F.log2(F.lit(num_docs) / F.col("df"))
    cand = (
        dd.join(F.broadcast(qd), "docid")
        .join(lex, "termid")
        .select("qid", "term", F.round(w, 6).alias("w"))
    )
    rk = Window.partitionBy("qid").orderBy(F.desc("w"), F.asc("term"))
    sel = (
        cand.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= max_terms)
        .select("qid", "term")
        .collect()  # bounded: len(doc_queries) x max_terms rows
    )
    by_qid: dict[int, list[str]] = {}
    for r in sel:
        by_qid.setdefault(int(r["qid"]), []).append(r["term"])
    return [
        {"qid": qid, "terms": sorted(terms), "mode": "disjunctive"}
        for qid, terms in sorted(by_qid.items())
    ]


def run_more_like_this(
    index: EFIndex,
    doc_queries: list[dict],
    *,
    max_terms: int = 10,
    k: int = 10,
    direct: DataFrame | None = None,
) -> DataFrame:
    """Find the documents most similar to each source doc: MLT term
    selection + disjunctive BM25, with the source document excluded
    from its own results (the MLT convention). Returns
    (qid, rank, docid, score)."""
    from terrier_ef_spark.query.engine import RESULT_SCHEMA, run_queries

    qd = more_like_this_terms(
        index, doc_queries, max_terms=max_terms, direct=direct
    )
    if not qd:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    deep = run_queries(index, qd, k=k + 1, strategy="term_major")
    src = index.spark.createDataFrame(
        [(int(q["qid"]), int(q["docid"])) for q in doc_queries],
        "qid long, docid long",
    )
    kept = deep.join(F.broadcast(src), ["qid", "docid"], "left_anti")
    w = Window.partitionBy("qid").orderBy(F.asc("rank"))
    return (
        kept.withColumn("new_rank", F.row_number().over(w))
        .where(F.col("new_rank") <= k)
        .select(
            "qid", F.col("new_rank").alias("rank"), "docid", "score"
        )
    )


# ---------------------------------------------------------------------------
# Batched query autocompletion — the Solr/Elasticsearch suggester role
# ---------------------------------------------------------------------------

def suggest_completions(
    index: EFIndex,
    prefixes: list[str],
    *,
    n_suggest: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Autocompletion for a BATCH of typed prefixes: for each prefix
    the lexicon terms starting with it, most-frequent-first (df desc,
    term asc), top n_suggest, df >= min_df (the tail-noise cut every
    production suggester applies). Returns (prefix, term, df).

    Batch analogue of expand_prefix's single-prefix driver loop (the
    spell_suggest generalization discipline): the WHOLE batch rides one
    lexicon pass — the OR of the per-prefix StringStartsWith filters is
    pushed to the term-range-sorted lexicon parquet (each prefix prunes
    to its own row-group range), survivors are labeled by a broadcast
    literal frame of prefixes (a nested-loop broadcast join over the
    already-pruned set — len(prefixes) comparisons per surviving term),
    and one window ranks per prefix. No per-prefix jobs, no collect: a
    pruned scan + broadcast join at a 10^9-term lexicon."""
    from functools import reduce
    from operator import or_

    if not prefixes:
        raise ValueError("no prefixes")
    if any(not p for p in prefixes):
        raise ValueError("empty prefix would expand the whole lexicon")
    if n_suggest < 1:
        raise ValueError(f"n_suggest must be >= 1: {n_suggest}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1: {min_df}")
    uniq = sorted(set(prefixes))
    spark = index.spark
    pf = spark.createDataFrame([(p,) for p in uniq], "prefix string")
    lex = index.lexicon.select(
        "term", F.col("df").cast("long").alias("df")
    ).where(
        reduce(or_, [F.col("term").startswith(p) for p in uniq])
        & (F.col("df") >= min_df)
    )
    labeled = lex.join(
        F.broadcast(pf), F.col("term").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        labeled.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= n_suggest)
        .select("prefix", "term", "df")
    )
