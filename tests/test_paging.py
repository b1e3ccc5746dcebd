"""Stateless deep pagination (engine.run_queries_page — the
Elasticsearch search_after role): 6dp-stable page ordering, cursor
filtering before the rank window, tie handling, page concatenation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.query.engine import run_queries, run_queries_page

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana spark",
    5: "merge merge table value",
    6: "cable value common common",
    7: "table common value",   # exact dup of doc 1: a guaranteed tie
    8: "spark table cable",
}

QUERIES = [
    {"qid": 1, "terms": ["spark", "table", "common"]},
    {"qid": 2, "terms": ["merge", "value"]},
]


@pytest.fixture(scope="module")
def page_idx(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("paging") / "idx"),
        log2_quantum=3, n_partitions=2,
    )


def _stable_full(idx, queries):
    """The full 6dp-stable ranking every page must be a slice of."""
    deep = run_queries(idx, queries, k=len(DOCS), strategy="term_major")
    rows = [
        (r["qid"], round(r["score"], 6), r["docid"])
        for r in deep.collect()
    ]
    out = {}
    for qid, s, d in rows:
        out.setdefault(qid, []).append((s, d))
    for qid in out:
        out[qid].sort(key=lambda t: (-t[0], t[1]))
    return out


def _cursor(page_rows, qid, k):
    mine = [r for r in page_rows if r["qid"] == qid]
    if len(mine) < k:
        return None
    last = max(mine, key=lambda r: r["rank"])
    return (last["score"], last["docid"])


def test_pages_concatenate_to_stable_ranking(page_idx):
    full = _stable_full(page_idx, QUERIES)
    k = 3
    p1 = run_queries_page(page_idx, QUERIES, k=k).collect()
    after = {
        q["qid"]: c
        for q in QUERIES
        if (c := _cursor(p1, q["qid"], k)) is not None
    }
    p2 = run_queries_page(page_idx, QUERIES, k=k, after=after).collect()
    for q in QUERIES:
        qid = q["qid"]
        got = (
            [(r["score"], r["docid"]) for r in sorted(
                (x for x in p1 if x["qid"] == qid), key=lambda r: r["rank"])]
            + [(r["score"], r["docid"]) for r in sorted(
                (x for x in p2 if x["qid"] == qid), key=lambda r: r["rank"])]
        )
        assert got == full[qid][: len(got)]
        # pages never overlap
        assert len({d for _, d in got}) == len(got)


def test_cursor_inside_tie_splits_on_docid(page_idx):
    """Docs 1 and 7 are identical -> identical scores; a cursor AT doc
    1 must yield doc 7 next, not skip or repeat the tie group."""
    q = [{"qid": 9, "terms": ["value"]}]
    full = _stable_full(page_idx, q)[9]
    tie_pos = next(
        i for i, (s, d) in enumerate(full) if d == 1 and full[i + 1][1] == 7
        and full[i + 1][0] == s
    )
    cur = {9: full[tie_pos]}
    got = run_queries_page(page_idx, q, k=2, after=cur).collect()
    got.sort(key=lambda r: r["rank"])
    assert [(r["score"], r["docid"]) for r in got] == full[
        tie_pos + 1 : tie_pos + 3
    ]


def test_page_ranks_restart_at_one(page_idx):
    p1 = run_queries_page(page_idx, QUERIES, k=2).collect()
    after = {q["qid"]: _cursor(p1, q["qid"], 2) for q in QUERIES}
    p2 = run_queries_page(page_idx, QUERIES, k=2, after=after).collect()
    for qid in (1, 2):
        assert sorted(r["rank"] for r in p2 if r["qid"] == qid) == [1, 2]


def test_exhausted_cursor_returns_empty(page_idx):
    full = _stable_full(page_idx, QUERIES)
    cur = {1: full[1][-1]}  # cursor at the very last result
    got = run_queries_page(page_idx, [QUERIES[0]], k=5, after=cur).collect()
    assert got == []


def test_queries_without_cursor_get_first_page(page_idx):
    full = _stable_full(page_idx, QUERIES)
    cur = {1: full[1][0]}  # only qid 1 has a cursor
    got = run_queries_page(page_idx, QUERIES, k=2, after=cur).collect()
    q2 = sorted((r for r in got if r["qid"] == 2), key=lambda r: r["rank"])
    assert [(r["score"], r["docid"]) for r in q2] == full[2][:2]
    q1 = sorted((r for r in got if r["qid"] == 1), key=lambda r: r["rank"])
    assert [(r["score"], r["docid"]) for r in q1] == full[1][1:3]


def test_page_guards(page_idx):
    with pytest.raises(ValueError, match="k must be"):
        run_queries_page(page_idx, QUERIES, k=0)
    with pytest.raises(ValueError, match="cursor"):
        run_queries_page(page_idx, QUERIES, after={1: (1.0,)})
