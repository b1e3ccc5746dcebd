"""Terrier-style query language over the EF engine.

The reference's ecosystem exposes retrieval through Terrier's query
language (documented at terrier.org, "Querying Terrier"; the operators
live in Terrier core's matchop/ql parsers — terrier-ef itself ships only
the index, reference README "use it like any Terrier index"). This
module gives the Spark engine the same user-facing surface, compiled
onto the primitives the engine already has rather than a new matcher:

    spark sql^2.5        weighted terms (^w multiplies the term's
                         contribution; repeated occurrences aggregate
                         additively, generalizing qtf weighting)
    +spark sql           '+' requirement: doc must contain the term
                         (the term also scores)
    -java spark          '-' prohibition: doc must not contain the term
                         (compiled to the engine's not_terms)
    "hello world"        exact phrase: terms score, docs are restricted
                         to phrase matches (phrase.phrase_hits)
    "hello world"~4      unordered window: all terms within a span of
                         <= 4 positions (phrase.window_hits)
    -"hello world"       negated phrase/window: matching docs excluded,
                         terms do not score
    tab*                 prefix expansion (expansion.expand_prefix:
                         df-ordered, capped — Lucene's PrefixQuery
                         rewrite discipline)
    tabel~               fuzzy expansion, edit distance <= 1
                         (expansion.expand_fuzzy, SymSpell candidates)

Raw words pass through the index's RECORDED term pipeline
(tokenizer/stopwords/stemming from params.json) exactly like document
content — Terrier's rule that queries and documents share the
termpipeline. A word the pipeline drops (stopword) silently leaves the
query, including its +/- constraint, which is Terrier's behavior; a
word the pipeline splits (camelCase under the code tokenizer) becomes
that many terms, each carrying the clause's operator and boost.

    {taxi cab}           synonym group (Terrier's {} / matchop #syn,
                         Lucene's SynonymQuery): members share ONE
                         merged posting list — tf = sum of member tfs
                         per doc, df = |docs containing any member| —
                         scored as a single BM25 unit (one saturation,
                         one idf), NOT as independent terms summed
    +{taxi cab}          requirement: doc must contain some member
    -{taxi cab}          prohibition: doc must contain no member

    title:spark          fielded term (FIELDED MODE ONLY — see
                         run_queries_ql_fielded): the term scores as a
                         BM25F unit restricted to that field; supports
                         ^w boosts, '+' requirement ("present in THAT
                         field"), '-' prohibition. In the default
                         single-field mode a colon is NOT an operator:
                         it falls through to the index's term pipeline
                         like any other character (the simple/code
                         tokenizers split on it).

Fielded-mode boundary (documented): phrases, synonym groups, and
prefix/fuzzy expansion are rejected in fielded mode — they would need
per-field positional/lexicon contracts the BM25F layout doesn't define.

Scale shape (100 TB design notes):
- scoring runs through engine.run_queries (decode-once term-major path);
  unconstrained topics in a batch share ONE run_queries call;
- '+' / phrase constraints compile to a per-topic candidate relation
  (docid) fed to run_queries(doc_filter=...) — a left-semi join on the
  decoded posting rows, never a collected id list;
- negated phrases subtract via a left-anti join on the docs table
  (lazy relational plan, no driver materialization);
- prefix/fuzzy expansion collects are bounded by max_expansions, the
  same driver-side discipline as PRF term selection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex

_PHRASE_RE = re.compile(
    r'([+-]?)"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?(?=\s|$)'
)
_GROUP_RE = re.compile(
    r'([+-]?)\{([^}]*)\}(?:\^(\d+(?:\.\d+)?))?(?=\s|$)'
)
_WORD_RE = re.compile(
    r'([+-]?)([^\s"^~*{}]+)([*~]?)(?:\^(\d+(?:\.\d+)?))?(?=\s|$)'
)
_FIELD_RE = re.compile(
    r'([+-]?)([A-Za-z_][A-Za-z0-9_]*):([^\s"^~*{}:]+)'
    r'(?:\^(\d+(?:\.\d+)?))?(?=\s|$)'
)


@dataclass(frozen=True)
class QLClause:
    """One parsed clause, pre-pipeline (raw words)."""

    kind: str  # 'term' | 'phrase' | 'group'
    words: tuple[str, ...]
    op: str = ""  # '' | '+' | '-'
    boost: float = 1.0
    window: int | None = None  # phrases: None = exact adjacency
    expand: str = ""  # terms: '' | 'prefix' | 'fuzzy'
    field: str = ""  # fielded mode only: '' = all fields


def parse_query(text: str, fields: frozenset[str] | None = None) -> list[QLClause]:
    """Tokenize one query-language string into clauses. Raises
    ValueError on malformed syntax (unbalanced quote, empty phrase,
    non-positive boost, boost/expansion on a prohibited term where the
    combination is meaningless). When `fields` is given (fielded mode),
    `field:word` clauses are recognized for exactly those field names;
    any other colon-bearing word is an error there (in the default mode
    a colon just flows into the term pipeline)."""
    clauses: list[QLClause] = []
    pos, n = 0, len(text)
    while pos < n:
        ch = text[pos]
        if ch.isspace():
            pos += 1
            continue
        m = _PHRASE_RE.match(text, pos)
        if m is None and (
            ch == '"' or (ch in "+-" and text[pos + 1 : pos + 2] == '"')
        ):
            raise ValueError(f"unbalanced or malformed quote at: {text[pos:]!r}")
        if m:
            op, body, win, boost = m.groups()
            words = tuple(body.split())
            if not words:
                raise ValueError("empty phrase")
            bv = float(boost) if boost else 1.0
            if bv <= 0:
                raise ValueError(f"boost must be > 0, got {boost}")
            if op == "-" and boost:
                raise ValueError(
                    "a boost on a prohibited phrase has no effect — "
                    "prohibited clauses do not score"
                )
            wv = int(win) if win else None
            if wv is not None and wv < 1:
                raise ValueError(f"window must be >= 1, got {win}")
            if len(words) == 1 and wv is None:
                # one-word "phrase" degenerates to a plain term
                clauses.append(QLClause("term", words, op, bv))
            else:
                clauses.append(QLClause("phrase", words, op, bv, wv))
            pos = m.end()
            continue
        m = _GROUP_RE.match(text, pos)
        if m is None and (
            ch == "{" or (ch in "+-" and text[pos + 1 : pos + 2] == "{")
        ):
            raise ValueError(f"unbalanced or malformed brace at: {text[pos:]!r}")
        if m:
            op, body, boost = m.groups()
            words = tuple(dict.fromkeys(body.split()))
            if not words:
                raise ValueError("empty synonym group")
            bv = float(boost) if boost else 1.0
            if bv <= 0:
                raise ValueError(f"boost must be > 0, got {boost}")
            if op == "-" and boost:
                raise ValueError(
                    "a boost on a prohibited group has no effect — "
                    "prohibited clauses do not score"
                )
            if len(words) == 1:
                # one-member group degenerates to a plain term
                clauses.append(QLClause("term", words, op, bv))
            else:
                clauses.append(QLClause("group", words, op, bv))
            pos = m.end()
            continue
        if fields is not None:
            fm = _FIELD_RE.match(text, pos)
            if fm and fm.group(2) in fields:
                op, fld, word, boost = fm.groups()
                bv = float(boost) if boost else 1.0
                if bv <= 0:
                    raise ValueError(f"boost must be > 0, got {boost}")
                if op == "-" and boost:
                    raise ValueError(
                        "a boost on a prohibited fielded term has no "
                        "effect — prohibited clauses do not score"
                    )
                clauses.append(QLClause("term", (word,), op, bv, field=fld))
                pos = fm.end()
                continue
            wm = _WORD_RE.match(text, pos)
            if wm and ":" in wm.group(2):
                raise ValueError(
                    f"cannot parse fielded clause at {text[pos:]!r}: "
                    f"supported fielded syntax is [+-]field:term[^w] with "
                    f"field in {sorted(fields)}"
                )
        m = _WORD_RE.match(text, pos)
        if not m:
            raise ValueError(f"cannot parse query at: {text[pos:]!r}")
        op, word, suffix, boost = m.groups()
        bv = float(boost) if boost else 1.0
        if bv <= 0:
            raise ValueError(f"boost must be > 0, got {boost}")
        if op == "-" and boost:
            raise ValueError(
                "a boost on a prohibited term has no effect — "
                "prohibited clauses do not score"
            )
        expand = {"*": "prefix", "~": "fuzzy", "": ""}[suffix]
        if op == "+" and expand:
            raise ValueError(
                f"'+' cannot combine with {suffix!r} expansion: a "
                "requirement over an unbounded rewrite set is ambiguous"
            )
        clauses.append(QLClause("term", (word,), op, bv, None, expand))
        pos = m.end()
    if not clauses:
        raise ValueError("empty query")
    return clauses


@dataclass
class CompiledQuery:
    """One topic compiled to engine primitives (post-pipeline terms)."""

    qid: int
    terms: list[str]
    weights: dict[str, float]
    not_terms: list[str]
    require_terms: list[str]
    phrases: list[tuple[tuple[str, ...], int | None, bool]]  # (terms, window, negated)
    groups: list[tuple[tuple[str, ...], float]] = None  # (members, weight)
    require_any: list[tuple[str, ...]] = None  # +groups: >=1 member present

    def __post_init__(self):
        self.groups = self.groups or []
        self.require_any = self.require_any or []

    @property
    def constrained(self) -> bool:
        return bool(self.require_terms or self.phrases or self.require_any)

    @property
    def scorable(self) -> bool:
        return bool(self.terms or self.groups)

    def engine_query(self) -> dict:
        q = {"qid": self.qid, "terms": self.terms, "mode": "disjunctive"}
        w = {t: v for t, v in self.weights.items() if v != 1.0}
        if w:
            q["weights"] = w
        if self.not_terms:
            q["not_terms"] = self.not_terms
        return q


def compile_query(
    index: EFIndex,
    qid: int,
    text: str,
    *,
    max_prefix_expansions: int = 50,
    max_fuzzy_expansions: int = 10,
) -> CompiledQuery:
    """Parse + resolve one topic against an index: every raw word runs
    through the index's recorded term pipeline; prefix/fuzzy clauses
    expand against the lexicon (bounded). Terms that the pipeline drops
    vanish, together with their operator — Terrier termpipeline
    semantics."""
    from terrier_ef_spark.query.expansion import expand_fuzzy, expand_prefix
    from terrier_ef_spark.tokenizer import tokenize_query

    clauses = parse_query(text)
    terms: list[str] = []
    weights: dict[str, float] = {}
    not_terms: list[str] = []
    require: list[str] = []
    phrases: list[tuple[tuple[str, ...], int | None, bool]] = []
    groups: list[tuple[tuple[str, ...], float]] = []
    require_any: list[tuple[str, ...]] = []

    def add_scored(term: str, w: float) -> None:
        if term not in weights:
            terms.append(term)
            weights[term] = w
        else:
            # per-occurrence additive aggregation (Terrier's
            # MatchingQueryTerms sums occurrence weights — qtf
            # generalized to boosts)
            weights[term] += w

    for c in clauses:
        if c.kind == "group":
            members = tuple(
                dict.fromkeys(
                    t for word in c.words for t in tokenize_query(index, word)
                )
            )
            if not members:
                continue  # the whole group vanished in the pipeline
            if c.op == "-":
                for t in members:
                    if t not in not_terms:
                        not_terms.append(t)
                continue
            if len(members) == 1:
                # pipeline collapsed the group to one term
                add_scored(members[0], c.boost)
                if c.op == "+" and members[0] not in require:
                    require.append(members[0])
                continue
            groups.append((members, c.boost))
            if c.op == "+":
                require_any.append(members)
            continue
        if c.kind == "phrase":
            resolved = tuple(
                t for word in c.words for t in tokenize_query(index, word)
            )
            if len(resolved) < 2:
                # pipeline collapsed the phrase below two terms: an
                # empty constraint matches everything; a single term
                # degrades to that term (scored unless prohibited)
                if resolved and c.op != "-":
                    add_scored(resolved[0], c.boost)
                continue
            if c.window is not None and len(set(resolved)) != len(resolved):
                raise ValueError(
                    f"windowed phrase has duplicate terms after the term "
                    f"pipeline: {resolved}"
                )
            phrases.append((resolved, c.window, c.op == "-"))
            if c.op != "-":
                for t in dict.fromkeys(resolved):
                    add_scored(t, c.boost)
            continue
        # term clause (possibly multi-term after the pipeline)
        resolved_t = [t for w in c.words for t in tokenize_query(index, w)]
        if c.expand:
            seeds, resolved_t = resolved_t, []
            for s in seeds:
                if c.expand == "prefix":
                    resolved_t.extend(
                        expand_prefix(index, s, max_prefix_expansions)
                    )
                else:
                    resolved_t.extend(
                        expand_fuzzy(index, s, max_fuzzy_expansions)
                    )
        for t in resolved_t:
            if c.op == "-":
                if t not in not_terms:
                    not_terms.append(t)
            else:
                add_scored(t, c.boost)
                if c.op == "+" and t not in require:
                    require.append(t)
    return CompiledQuery(int(qid), terms, weights, not_terms, require,
                         phrases, groups, require_any)


def _candidate_filter(index: EFIndex, cq: CompiledQuery) -> DataFrame | None:
    """The (docid) candidate relation for a constrained topic: docs
    containing every required term AND every positive phrase/window AND
    (for each '+' synonym group) at least one member, minus docs
    matching any negated phrase/window. Pure relational — semi/anti
    joins over decoded posting/position rows, no collects."""
    from terrier_ef_spark.query.engine import decode_postings
    from terrier_ef_spark.query.phrase import phrase_hits, window_hits

    positive: list[DataFrame] = []
    if cq.require_terms:
        req = decode_postings(index, cq.require_terms)
        positive.append(
            req.groupBy("docid")
            .agg(F.count_distinct("term").alias("nt"))
            .where(F.col("nt") == len(set(cq.require_terms)))
            .select("docid")
        )
    for members in cq.require_any:
        positive.append(
            decode_postings(index, list(members)).select("docid").distinct()
        )
    negative: list[DataFrame] = []
    for p_terms, win, negated in cq.phrases:
        hits = (
            phrase_hits(index, list(p_terms))
            if win is None
            else window_hits(index, list(p_terms), win)
        ).select("docid")
        (negative if negated else positive).append(hits)
    if not positive and not negative:
        return None
    if positive:
        flt = reduce(lambda a, b: a.join(b, "docid", "left_semi"), positive)
    else:
        # negations only: start from the full docs relation (lazy — the
        # anti join below is what executes, scan-pruned to docid)
        flt = index.docs.select("docid")
    for neg in negative:
        flt = flt.join(neg, "docid", "left_anti")
    return flt


def _score_topic_groups(
    index: EFIndex,
    cq: CompiledQuery,
    k: int,
    k1: float | None,
    b: float | None,
) -> DataFrame:
    """Single-topic scorer for queries carrying synonym groups: each
    group is ONE scoring unit over its merged posting list (per-doc
    tf = sum of member tfs; df = |docs containing any member|, computed
    relationally as a 1-row broadcast, never a collected set), plain
    terms keep their lexicon df — both feed the engine's own BM25
    contribution expression, so a one-member group and a plain term
    score identically. Constraints/tombstones/not_terms apply exactly
    as in the engine's term-major path (semi/anti joins on the posting
    rows, pre-top-k). The merged relations are persisted for the two
    reads (df agg + scoring) and released eagerly with the top-k."""
    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.engine import (
        _bm25_contrib_expr,
        decode_postings,
    )
    from terrier_ef_spark.util import eager_release
    from pyspark.sql import Window

    spark = index.spark
    stats = index.stats
    if k1 is None:
        k1 = float(stats.get("k1", bm25.K1))
    if b is None:
        b = float(stats.get("b", bm25.B))
    num_docs = float(stats["num_docs"])
    avgdl = float(stats["avgdl"])

    units: list[DataFrame] = []
    cached: list[DataFrame] = []
    if cq.terms:
        wrows = spark.createDataFrame(
            [(t, float(cq.weights.get(t, 1.0))) for t in cq.terms],
            "term string, w double",
        )
        lex = index.lexicon.select(
            "term", F.col("df").cast("double").alias("global_df")
        ).where(F.col("term").isin(cq.terms))
        units.append(
            decode_postings(index, cq.terms)
            .join(F.broadcast(lex), "term")
            .join(F.broadcast(wrows), "term")
            .select(
                "docid", F.col("tf").cast("double").alias("tf"),
                "global_df", "w",
            )
        )
    for members, w in cq.groups:
        merged = (
            decode_postings(index, list(members))
            .groupBy("docid")
            .agg(F.sum("tf").cast("double").alias("tf"))
            .persist()
        )
        cached.append(merged)
        dfrel = merged.agg(
            F.count(F.lit(1)).cast("double").alias("global_df")
        )
        units.append(
            merged.crossJoin(F.broadcast(dfrel))
            .withColumn("w", F.lit(float(w)))
            .select("docid", "tf", "global_df", "w")
        )
    posts = reduce(lambda a, c: a.unionByName(c), units)

    flt = _candidate_filter(index, cq)
    if flt is not None:
        posts = posts.join(flt, "docid", "left_semi")
    tomb = index.deleted_docids()
    if tomb is not None:
        posts = posts.join(tomb.select("docid"), "docid", "left_anti")
    if cq.not_terms:
        excl = (
            decode_postings(index, cq.not_terms).select("docid").distinct()
        )
        posts = posts.join(excl, "docid", "left_anti")
    posts = posts.join(index.docs.select("docid", "doclen"), "docid")
    contrib = _bm25_contrib_expr(
        num_docs, avgdl, F.col("tf"), F.col("doclen").cast("double"), k1, b
    )
    scored = (
        posts.select("docid", (contrib * F.col("w")).alias("c"))
        .groupBy("docid")
        .agg(F.sum("c").alias("score"))
    )
    # distributed TakeOrdered first; the single-partition ranking window
    # then sees at most k rows (same shape as phrase._rank_hits)
    top = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    w_ = Window.orderBy(F.desc("score"), F.asc("docid"))
    res = top.select(
        F.lit(cq.qid).cast("long").alias("qid"),
        F.row_number().over(w_).cast("int").alias("rank"),
        F.col("docid").cast("long").alias("docid"),
        F.col("score").cast("double").alias("score"),
    )
    return eager_release(res, *cached) if cached else res


def run_queries_ql(
    index: EFIndex,
    topics: list[dict],
    *,
    k: int = 10,
    algo: str = "naive",
    k1: float | None = None,
    b: float | None = None,
    max_prefix_expansions: int = 50,
    max_fuzzy_expansions: int = 10,
) -> DataFrame:
    """Answer query-language topics: [{'qid': int, 'query': str}] ->
    (qid, rank, docid, score), the engine's result contract.

    Execution plan: topics without +/phrase constraints share ONE
    term-major run_queries call (decode-once across the whole batch;
    `algo` applies there, degraded to 'naive' when any topic carries
    not_terms — the engine's exclusion rule); each constrained topic
    runs with its own candidate doc_filter, which forces the exhaustive
    scorer (pruning thresholds seeded pre-filter would over-prune,
    engine.run_queries's rule); each topic carrying a synonym group
    runs the dedicated merged-posting-list scorer
    (_score_topic_groups). Topics whose scoring terms all vanish in
    the pipeline return no rows, like an out-of-vocabulary Terrier
    query. k1/b pass straight through to run_queries (None = the
    index's recorded build-time defaults)."""
    from terrier_ef_spark.query.engine import RESULT_SCHEMA, run_queries

    compiled = [
        compile_query(
            index, t["qid"], t["query"],
            max_prefix_expansions=max_prefix_expansions,
            max_fuzzy_expansions=max_fuzzy_expansions,
        )
        for t in topics
    ]
    qids = [c.qid for c in compiled]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate qids in topic batch")
    grouped = [c for c in compiled if c.groups and c.scorable]
    simple = [
        c for c in compiled if not c.groups and not c.constrained and c.terms
    ]
    constrained = [
        c for c in compiled if not c.groups and c.constrained and c.terms
    ]

    parts: list[DataFrame] = []
    for c in grouped:
        # synonym groups change the scoring unit (merged df/tf) — each
        # such topic runs the dedicated group scorer
        parts.append(_score_topic_groups(index, c, k, k1, b))
    if simple:
        batch_algo = (
            "naive" if any(c.not_terms for c in simple) else algo
        )
        parts.append(
            run_queries(
                index, [c.engine_query() for c in simple], k=k,
                algo=batch_algo, strategy="term_major", k1=k1, b=b,
            )
        )
    for c in constrained:
        # all scored terms required and no phrases: the engine's
        # conjunctive mode expresses the constraint without a filter
        # relation (and stays eligible for the skip-driven decode)
        if not c.phrases and set(c.require_terms) == set(c.terms):
            q = c.engine_query()
            q["mode"] = "conjunctive"
            parts.append(
                run_queries(index, [q], k=k, strategy="term_major",
                            k1=k1, b=b)
            )
            continue
        flt = _candidate_filter(index, c)
        parts.append(
            run_queries(
                index, [c.engine_query()], k=k, strategy="term_major",
                doc_filter=flt, k1=k1, b=b,
            )
        )
    if not parts:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    return reduce(lambda a, b: a.unionByName(b), parts)


@dataclass
class FieldedQuery:
    """One fielded-QL topic compiled to BM25F scoring units.

    A unit is (field, term) — field '' means "all fields" (the plain
    BM25F unit: per-field normalized tfs weighted and summed, combined
    any-field df). A named field restricts the unit to that field's
    postings and that field's df. Either way there is ONE saturation
    and ONE idf per unit (Zaragoza et al. 2004 discipline, extended to
    Terrier's `field:term` restriction operator)."""

    qid: int
    units: dict[tuple[str, str], float]  # (field|'', term) -> weight
    require: list[tuple[str, str]]  # '+': doc must contain term in field
    not_units: list[tuple[str, str]]  # '-': doc must not


def compile_query_fielded(
    fields: dict, qid: int, text: str
) -> FieldedQuery:
    """Parse + resolve one fielded-QL topic: raw words run through the
    RECORDED term pipeline of the index they're restricted to (the
    first field's pipeline for unfielded words — field indexes are
    built over the same corpus, so pipelines agree by construction).
    Repeated (field, term) occurrences aggregate boosts additively —
    the same qtf generalization as the single-field QL. Phrases,
    synonym groups and prefix/fuzzy expansion raise (documented
    fielded-mode boundary)."""
    from terrier_ef_spark.tokenizer import tokenize_query

    names = sorted(fields)
    clauses = parse_query(text, fields=frozenset(names))
    units: dict[tuple[str, str], float] = {}
    require: list[tuple[str, str]] = []
    not_units: list[tuple[str, str]] = []
    for c in clauses:
        if c.kind != "term":
            raise ValueError(
                f"fielded QL supports term clauses only — {c.kind!r} "
                "clauses (phrases/synonym groups) are a documented "
                "fielded-mode boundary"
            )
        if c.expand:
            raise ValueError(
                "prefix/fuzzy expansion is not supported in fielded QL"
            )
        pipe_idx = fields[c.field] if c.field else fields[names[0]]
        resolved = [t for w in c.words for t in tokenize_query(pipe_idx, w)]
        for t in resolved:
            key = (c.field, t)
            if c.op == "-":
                if key not in not_units:
                    not_units.append(key)
                continue
            units[key] = units.get(key, 0.0) + c.boost
            if c.op == "+" and key not in require:
                require.append(key)
    return FieldedQuery(int(qid), units, require, not_units)


def run_queries_ql_fielded(
    fields: dict,
    topics: list[dict],
    *,
    k: int = 10,
    weights: dict[str, float] | None = None,
    bs: dict[str, float] | None = None,
    k1: float | None = None,
    respect_deletes: bool = True,
) -> DataFrame:
    """Answer fielded query-language topics over per-field EF indexes
    (the BM25F layout of query/bm25f.py): [{'qid', 'query'}] ->
    (qid, rank, docid, score).

    Scoring: every unit u contributes w_u * idf(df_u) * tfn_u /
    (k1 + tfn_u). For an unfielded term, tfn sums the weighted
    per-field normalized tfs and df counts docs containing the term in
    ANY field — exactly run_queries_bm25f's unit, so a topic with no
    fielded clauses is rank+score identical to the BM25F scorer. For
    `f:term`, tfn is the single weighted field-normalized tf and df is
    field f's document frequency. '+f:term' additionally requires the
    doc to contain the term in f; '-f:term' excludes such docs
    ('+term'/'-term' read "in any field").

    Scale shape: ONE decode pass per field over the union of the
    batch's terms (persisted for its multiple reads: unit fold, df
    window, presence constraints); units/requirements ride broadcast
    literal frames; constraints are semi/anti joins on (qid, docid) —
    no per-topic Spark jobs, no collected id lists. Same two shuffles
    as run_queries_bm25f plus one for the constraint fold when '+'
    clauses are present."""
    from terrier_ef_spark.query import bm25
    from terrier_ef_spark.query.engine import RESULT_SCHEMA, decode_postings
    from terrier_ef_spark.util import eager_release
    from pyspark.sql import Window

    if not fields:
        raise ValueError("fielded QL needs at least one field index")
    names = sorted(fields)
    spark = fields[names[0]].spark
    num_docs = float(fields[names[0]].stats["num_docs"])
    for n in names[1:]:
        if float(fields[n].stats["num_docs"]) != num_docs:
            raise ValueError(
                "field indexes disagree on num_docs — they must be built "
                "over the same docid space"
            )
    weights = weights or {}
    bs = bs or {}
    if k1 is None:
        k1 = bm25.K1

    compiled = [
        compile_query_fielded(fields, t["qid"], t["query"]) for t in topics
    ]
    qids = [c.qid for c in compiled]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate qids in topic batch")

    # per-field decode term sets: a unit/constraint on field f needs f;
    # an unfielded one needs every field
    need: dict[str, set[str]] = {n: set() for n in names}
    for cq in compiled:
        for f, t in set(cq.units) | set(cq.require) | set(cq.not_units):
            for n in ([f] if f else names):
                need[n].add(t)
    if not any(cq.units for cq in compiled):
        return spark.createDataFrame([], RESULT_SCHEMA)

    parts: list[DataFrame] = []
    for name in names:
        if not need[name]:
            continue
        idx = fields[name]
        w = float(weights.get(name, 1.0))
        b = float(bs.get(name, bm25.B))
        avgdl = float(idx.stats["avgdl"])
        rows = decode_postings(idx, sorted(need[name])).join(
            idx.docs.select("docid", "doclen"), "docid"
        )
        tf = F.col("tf").cast("double")
        dl = F.col("doclen").cast("double")
        tfn = tf / (1 + F.lit(b) * (dl / F.lit(avgdl) - 1))
        parts.append(rows.select(
            F.lit(name).alias("field"), "term", "docid",
            (F.lit(w) * tfn).alias("wtfn"),
        ))
    posts = reduce(lambda a, p: a.unionByName(p), parts).persist()

    # unit relations: '' = any-field fold (one shuffle), named field =
    # the per-field rows as-is (already one row per (field, term, doc))
    ukeys = sorted({key for cq in compiled for key in cq.units})
    fold_parts: list[DataFrame] = []
    if any(f == "" for f, _ in ukeys):
        fold_parts.append(
            posts.groupBy("term", "docid")
            .agg(F.sum("wtfn").alias("tfn"))
            .select(F.lit("").alias("field"), "term", "docid", "tfn")
        )
    if any(f != "" for f, _ in ukeys):
        fold_parts.append(
            posts.select("field", "term", "docid",
                         F.col("wtfn").alias("tfn"))
        )
    folded = reduce(lambda a, p: a.unionByName(p), fold_parts).join(
        F.broadcast(
            spark.createDataFrame(ukeys, "field string, term string")
        ),
        ["field", "term"],
        "left_semi",
    )
    # df per unit: the fold is query-independent (full posting lists),
    # so a count per (field, term) IS the unit's document frequency —
    # any-field df for merged units, the field's lexicon df for
    # restricted ones
    folded = folded.withColumn(
        "global_df",
        F.count(F.lit(1)).over(Window.partitionBy("field", "term")),
    )
    idf = F.log2(
        (F.lit(num_docs) - F.col("global_df") + 0.5)
        / (F.col("global_df") + 0.5)
    )
    units_df = spark.createDataFrame(
        [(cq.qid, f, t, float(w)) for cq in compiled
         for (f, t), w in cq.units.items()],
        "qid long, field string, term string, w double",
    )
    scored = (
        folded.select(
            "field", "term", "docid",
            (idf * F.col("tfn") / (F.lit(float(k1)) + F.col("tfn"))).alias("uc"),
        )
        .join(F.broadcast(units_df), ["field", "term"])
        .select("qid", "docid", (F.col("uc") * F.col("w")).alias("c"))
    )

    req_rows = [(cq.qid, f, t) for cq in compiled for f, t in cq.require]
    not_rows = [(cq.qid, f, t) for cq in compiled for f, t in cq.not_units]
    if req_rows or not_rows:
        pres = posts.select("field", "term", "docid").unionByName(
            posts.select(F.lit("").alias("field"), "term", "docid")
            .distinct()
        )
    if req_rows:
        req_df = spark.createDataFrame(
            req_rows, "qid long, field string, term string"
        )
        nreq = spark.createDataFrame(
            [(cq.qid, len(cq.require)) for cq in compiled if cq.require],
            "qid long, n long",
        )
        cand = (
            pres.join(F.broadcast(req_df), ["field", "term"])
            .groupBy("qid", "docid")
            .agg(F.count_distinct(F.concat_ws("\x00", "field", "term"))
                 .alias("nu"))
            .join(F.broadcast(nreq), "qid")
            .where(F.col("nu") == F.col("n"))
            .select("qid", "docid")
        )
        req_qids = sorted({cq.qid for cq in compiled if cq.require})
        scored = scored.where(~F.col("qid").isin(req_qids)).unionByName(
            scored.join(cand, ["qid", "docid"], "left_semi")
        )
    if not_rows:
        not_df = spark.createDataFrame(
            not_rows, "qid long, field string, term string"
        )
        excl = (
            pres.join(F.broadcast(not_df), ["field", "term"])
            .select("qid", "docid")
            .distinct()
        )
        scored = scored.join(excl, ["qid", "docid"], "left_anti")
    if respect_deletes:
        tombs = [t for t in (fields[n].deleted_docids() for n in names)
                 if t is not None]
        if tombs:
            tomb = tombs[0].select("docid")
            for t in tombs[1:]:
                tomb = tomb.unionByName(t.select("docid"))
            scored = scored.join(tomb.distinct(), "docid", "left_anti")

    agg = scored.groupBy("qid", "docid").agg(F.sum("c").alias("score"))
    wnd = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    res = (
        agg.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
    return eager_release(res, posts)
