"""Fielded query language (field:term over the BM25F layout):
parser unit tests, exact scores vs a clean-room Python mirror,
identity with run_queries_bm25f on unfielded topics, and the
+/- constraint semantics."""

import math

import pytest

from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.bm25f import run_queries_bm25f
from terrier_ef_spark.query.parser import (
    compile_query_fielded,
    parse_query,
    run_queries_ql_fielded,
)

CONTENT = {
    0: "beta beta gamma",
    1: "alpha alpha alpha beta delta delta",
    2: "beta gamma delta",
    3: "gamma gamma delta",
    4: "beta delta",
    5: "delta delta gamma beta",
}
TITLE = {
    0: "intro notes",
    1: "misc notes alpha",
    2: "alpha alpha",
    3: "gamma",
    4: "other one",
    5: "more stuff",
}
W = {"content": 1.0, "title": 3.0}
K1, B = 1.2, 0.75

FIELDS = frozenset({"content", "title"})


@pytest.fixture(scope="module")
def field_indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qlf")
    out = {}
    for name, texts in (("content", CONTENT), ("title", TITLE)):
        rows = [("r", f"f{d}", "c0", "t", txt, d)
                for d, txt in sorted(texts.items())]
        corpus = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string,"
            " content string, doc_id long"
        )
        out[name] = build_index(spark, corpus, str(root / name),
                                log2_quantum=3, n_partitions=2)
    return out


# ---------------------------------------------------------------- mirror

def _toks():
    return {"content": {d: c.split() for d, c in CONTENT.items()},
            "title": {d: c.split() for d, c in TITLE.items()}}


def _mirror(units, require=(), prohibit=()):
    """Independent fielded-BM25F computation: units is a list of
    ((field_or_'', term), weight); require/prohibit are (field, term)
    with '' meaning any field."""
    toks = _toks()
    n = len(CONTENT)
    avgdl = {f: sum(len(t) for t in ts.values()) / n
             for f, ts in toks.items()}

    def tfn(field, term, d):
        if field:
            tf = toks[field][d].count(term)
            if not tf:
                return 0.0
            dl = len(toks[field][d])
            return W[field] * tf / (1 + B * (dl / avgdl[field] - 1))
        return sum(tfn(f, term, d) for f in toks)

    def df(field, term):
        if field:
            return sum(1 for d in CONTENT if term in toks[field][d])
        return sum(1 for d in CONTENT
                   if any(term in toks[f][d] for f in toks))

    def present(field, term, d):
        if field:
            return term in toks[field][d]
        return any(term in toks[f][d] for f in toks)

    scores = {}
    for d in CONTENT:
        if any(present(f, t, d) for f, t in prohibit):
            continue
        if require and not all(present(f, t, d) for f, t in require):
            continue
        s = 0.0
        for (f, t), w in units:
            v = tfn(f, t, d)
            if v:
                dfv = df(f, t)
                s += w * math.log2((n - dfv + 0.5) / (dfv + 0.5)) \
                    * v / (K1 + v)
        if s:
            scores[d] = s
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


def _run(field_indexes, topics, **kw):
    res = run_queries_ql_fielded(field_indexes, topics, weights=W, **kw)
    out = {}
    for r in res.collect():
        out.setdefault(int(r["qid"]), []).append(
            (int(r["docid"]), float(r["score"]))
        )
    for v in out.values():
        v.sort(key=lambda x: (-x[1], x[0]))
    return out


def _assert_close(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (gd, wd)


# ----------------------------------------------------------------- parse

def test_parse_fielded_clause():
    (c,) = parse_query("title:alpha^2", fields=FIELDS)
    assert (c.kind, c.field, c.words, c.boost) == \
        ("term", "title", ("alpha",), 2.0)
    (c,) = parse_query("+content:beta", fields=FIELDS)
    assert (c.op, c.field) == ("+", "content")
    (c,) = parse_query("-title:gamma", fields=FIELDS)
    assert (c.op, c.field) == ("-", "title")


def test_parse_unfielded_mode_colon_passthrough():
    # default mode: the colon is NOT an operator, the word survives
    (c,) = parse_query("title:alpha")
    assert c.field == "" and c.words == ("title:alpha",)


def test_parse_fielded_rejects():
    with pytest.raises(ValueError, match="field"):
        parse_query("nosuch:alpha", fields=FIELDS)
    with pytest.raises(ValueError, match="fielded"):
        parse_query("title:alp*", fields=FIELDS)
    with pytest.raises(ValueError, match="prohibited"):
        parse_query("-title:alpha^2", fields=FIELDS)
    with pytest.raises(ValueError, match="boost"):
        parse_query("title:alpha^0", fields=FIELDS)


def test_compile_rejects_phrase_and_group(field_indexes):
    with pytest.raises(ValueError, match="boundary"):
        compile_query_fielded(field_indexes, 1, '"alpha beta"')
    with pytest.raises(ValueError, match="boundary"):
        compile_query_fielded(field_indexes, 1, "{alpha beta}")
    with pytest.raises(ValueError, match="expansion"):
        compile_query_fielded(field_indexes, 1, "alp*")


def test_compile_qtf_aggregation(field_indexes):
    cq = compile_query_fielded(field_indexes, 7, "title:alpha title:alpha")
    assert cq.units == {("title", "alpha"): 2.0}
    cq2 = compile_query_fielded(field_indexes, 7, "title:alpha^2")
    assert cq.units == cq2.units


# ----------------------------------------------------------------- score

def test_unfielded_topic_matches_bm25f(field_indexes):
    topics = [{"qid": 1, "query": "alpha gamma"}]
    got = _run(field_indexes, topics, k=10)[1]
    ref = [
        (int(r["docid"]), float(r["score"]))
        for r in run_queries_bm25f(
            field_indexes, [{"qid": 1, "terms": ["alpha", "gamma"]}],
            k=10, weights=W,
        ).orderBy("rank").collect()
    ]
    _assert_close(got, ref)
    _assert_close(got, _mirror([(("", "alpha"), 1.0), (("", "gamma"), 1.0)]))


def test_fielded_unit_matches_mirror(field_indexes):
    got = _run(field_indexes, [{"qid": 1, "query": "title:alpha gamma"}])[1]
    _assert_close(
        got, _mirror([(("title", "alpha"), 1.0), (("", "gamma"), 1.0)])
    )


def test_same_term_two_fields_are_two_units(field_indexes):
    got = _run(
        field_indexes,
        [{"qid": 1, "query": "content:alpha title:alpha"}],
    )[1]
    _assert_close(
        got,
        _mirror([(("content", "alpha"), 1.0), (("title", "alpha"), 1.0)]),
    )


def test_boost_scales_unit(field_indexes):
    got = _run(field_indexes, [{"qid": 1, "query": "title:alpha^2.5 beta"}])[1]
    _assert_close(
        got, _mirror([(("title", "alpha"), 2.5), (("", "beta"), 1.0)])
    )


def test_require_filters_not_rescores(field_indexes):
    base = _run(field_indexes, [{"qid": 1, "query": "title:alpha beta"}])[1]
    req = _run(field_indexes, [{"qid": 1, "query": "+title:alpha beta"}])[1]
    _assert_close(
        req,
        _mirror([(("title", "alpha"), 1.0), (("", "beta"), 1.0)],
                require=[("title", "alpha")]),
    )
    # required docs keep their unconstrained scores
    base_scores = dict(base)
    for d, s in req:
        assert s == pytest.approx(base_scores[d], abs=1e-9)


def test_prohibit_fielded(field_indexes):
    # doc 2 has alpha in title; doc 1 has alpha in title AND content
    got = _run(field_indexes, [{"qid": 1, "query": "beta -title:alpha"}])[1]
    _assert_close(
        got, _mirror([(("", "beta"), 1.0)], prohibit=[("title", "alpha")])
    )
    assert all(d not in (1, 2) for d, _ in got)


def test_mixed_batch_equals_solo(field_indexes):
    topics = [
        {"qid": 1, "query": "alpha gamma"},
        {"qid": 2, "query": "title:alpha^2 beta"},
        {"qid": 3, "query": "+title:gamma delta"},
        {"qid": 4, "query": "beta -content:gamma"},
    ]
    batch = _run(field_indexes, topics)
    for t in topics:
        solo = _run(field_indexes, [t])[t["qid"]]
        _assert_close(batch[t["qid"]], solo)


def test_all_units_vanish_returns_empty(field_indexes):
    out = _run(field_indexes, [{"qid": 1, "query": "-title:alpha"}])
    assert out == {}
