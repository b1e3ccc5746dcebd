"""Significant-terms aggregation (query/significant.py): JLH-scored
foreground-vs-background term lift over the disjunctive match set,
gathered from the direct index."""

from __future__ import annotations

from collections import Counter

import pytest

from terrier_ef_spark.query.significant import significant_terms

DOCS = {
    # "spark" foreground: shuffle is concentrated there, "the" is
    # everywhere (fg% == bg% -> excluded by the strict lift test),
    # "rare" appears once (min_fg_df fodder).
    0: "spark shuffle the stage",
    1: "spark shuffle the executor",
    2: "spark the rare",
    3: "table the cable",
    4: "merge the cable",
    5: "banana the orange",
}


@pytest.fixture(scope="module")
def sig_index(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.direct import build_direct

    rows = [
        ("r", f"f{d}", "c0", "t", text, d) for d, text in sorted(DOCS.items())
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("sig") / "idx"),
        log2_quantum=3, n_partitions=2,
    )
    direct = build_direct(idx, n_partitions=2)
    return idx, direct


def jlh_mirror(query_terms, *, top_terms=10, min_fg_df=1):
    toks = {d: t.split() for d, t in DOCS.items()}
    n = len(toks)
    matched = sorted(
        d for d, ts in toks.items() if set(ts) & set(query_terms)
    )
    fg_size = len(matched)
    bg = Counter(t for ts in toks.values() for t in set(ts))
    fg = Counter(t for d in matched for t in set(toks[d]))
    out = []
    for t, fdf in fg.items():
        if t in query_terms or fdf < min_fg_df:
            continue
        fgp, bgp = fdf / fg_size, bg[t] / n
        if fgp <= bgp:
            continue
        out.append((t, fdf, bg[t], round((fgp - bgp) * (fgp / bgp), 6)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return [
        (t, fdf, bdf, s, i + 1)
        for i, (t, fdf, bdf, s) in enumerate(out[:top_terms])
    ]


def run(sig_index, queries, **kw):
    idx, direct = sig_index
    out = significant_terms(idx, queries, direct=direct, **kw)
    return {
        qid: sorted(
            ((r.term, r.fg_df, r.bg_df, r.score, r.rank) for r in rows),
            key=lambda x: x[4],
        )
        for qid, rows in _group(out.collect()).items()
    }


def _group(rows):
    g = {}
    for r in rows:
        g.setdefault(r.qid, []).append(r)
    return g


def test_matches_mirror(sig_index):
    got = run(sig_index, [{"qid": 1, "terms": ["spark"]}])
    assert got[1] == jlh_mirror({"spark"})
    # shuffle (2/3 fg vs 2/6 bg) must lead; "the" is absent (no lift).
    assert got[1][0][0] == "shuffle"
    assert all(t != "the" for t, *_ in got[1])


def test_query_terms_excluded(sig_index):
    got = run(sig_index, [{"qid": 1, "terms": ["spark", "shuffle"]}])
    terms = {t for t, *_ in got[1]}
    assert not terms & {"spark", "shuffle"}
    assert got[1] == jlh_mirror({"spark", "shuffle"})


def test_min_fg_df(sig_index):
    loose = run(sig_index, [{"qid": 1, "terms": ["spark"]}])
    tight = run(sig_index, [{"qid": 1, "terms": ["spark"]}], min_fg_df=2)
    assert any(r[1] == 1 for r in loose[1])  # "rare" present at 1
    assert all(r[1] >= 2 for r in tight[1])
    assert tight[1] == jlh_mirror({"spark"}, min_fg_df=2)


def test_top_terms_cap_and_multi_query(sig_index):
    got = run(
        sig_index,
        [{"qid": 1, "terms": ["spark"]}, {"qid": 2, "terms": ["cable"]}],
        top_terms=2,
    )
    assert got[1] == jlh_mirror({"spark"}, top_terms=2)
    assert got[2] == jlh_mirror({"cable"}, top_terms=2)
    assert len(got[1]) <= 2 and len(got[2]) <= 2


def test_tombstoned_docs_leave_foreground(spark, tmp_path):
    """Deleting a foreground doc changes fg_df/fg_size immediately
    (the run_queries respect_deletes convention); background df stays
    collection-level until compaction."""
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.direct import build_direct
    from terrier_ef_spark.index.maintenance import delete_docs

    rows = [
        ("r", f"f{d}", "c0", "t", text, d) for d, text in sorted(DOCS.items())
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "idx"), log2_quantum=3, n_partitions=2,
    )
    direct = build_direct(idx, n_partitions=2)
    before = significant_terms(
        idx, [{"qid": 1, "terms": ["spark"]}], direct=direct
    ).collect()
    delete_docs(idx, [0])  # doc 0 carries spark+shuffle
    after = significant_terms(
        idx, [{"qid": 1, "terms": ["spark"]}], direct=direct
    ).collect()
    b = {r.term: r for r in before}
    a = {r.term: r for r in after}
    # shuffle's foreground df drops 2 -> 1 (doc 0 left the match set)
    assert b["shuffle"].fg_df == 2 and a["shuffle"].fg_df == 1
    # background df is untouched until compaction
    assert b["shuffle"].bg_df == a["shuffle"].bg_df == 2


def test_guards(sig_index):
    idx, direct = sig_index
    with pytest.raises(ValueError, match="top_terms"):
        significant_terms(idx, [{"qid": 1, "terms": ["a"]}], top_terms=0)
    with pytest.raises(ValueError, match="min_fg_df"):
        significant_terms(idx, [{"qid": 1, "terms": ["a"]}], min_fg_df=0)
    with pytest.raises(ValueError, match="no query terms"):
        significant_terms(idx, [])


def test_missing_direct_index_named_error(spark, tmp_path):
    from terrier_ef_spark.index.builder import build_index

    corpus = spark.createDataFrame(
        [("r", "f0", "c0", "t", "table", 0)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "idx"), log2_quantum=3, n_partitions=1,
    )
    with pytest.raises(ValueError, match="direct"):
        significant_terms(idx, [{"qid": 1, "terms": ["table"]}])
