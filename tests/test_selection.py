"""CORI resource selection + selective search (query/selection.py):
pinned-formula mirror, routing sanity, and the score-identity contract
with exhaustive global-stats sharded retrieval."""

from __future__ import annotations

import math

import pytest

from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.query.selection import (
    rank_shards_cori,
    run_queries_selective,
)
from terrier_ef_spark.query.sharded import run_queries_sharded

SHARD0 = {
    0: "alpha beta alpha",
    1: "alpha gamma",
    2: "beta beta delta",
    3: "gamma delta epsilon",
}
SHARD1 = {
    4: "alpha alpha alpha alpha",
    5: "zeta eta",
}
QUERIES = [
    {"qid": 1, "terms": ["alpha", "beta"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["zeta"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["missingterm"], "mode": "disjunctive"},
]

# hand-derived corpus statistics for the mirror
DF = [
    {"alpha": 2, "beta": 2, "gamma": 2, "delta": 2, "epsilon": 1},
    {"alpha": 1, "zeta": 1, "eta": 1},
]
CW = [11.0, 6.0]


def _mirror_cori(terms, b=0.4):
    """Pure-Python CORI beliefs for the two hand-built shards."""
    c = 2
    avg_cw = sum(CW) / c
    out = []
    for shard in range(c):
        score = 0.0
        for t in terms:
            df = float(DF[shard].get(t, 0))
            cf = float(sum(1 for s in range(c) if t in DF[s]))
            t_part = df / (df + 50.0 + 150.0 * CW[shard] / avg_cw)
            i_part = (
                math.log((c + 0.5) / cf) / math.log(c + 1.0) if cf else 0.0
            )
            score += b + (1.0 - b) * t_part * i_part
        out.append(round(score, 6))
    return out


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cori")
    out = []
    for i, texts in enumerate((SHARD0, SHARD1)):
        rows = [("r", f"f{d}", "c0", "t", txt, d)
                for d, txt in sorted(texts.items())]
        corpus = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string,"
            " content string, doc_id long",
        )
        out.append(
            build_index(spark, corpus, str(root / f"s{i}"),
                        block_bits=4, n_partitions=2)
        )
    return out


def test_cori_matches_pinned_mirror(spark, shards):
    got = {
        (int(r["qid"]), int(r["shard"])): (int(r["rank"]), float(r["score"]))
        for r in rank_shards_cori(shards, QUERIES).collect()
    }
    assert len(got) == 6  # every (qid, shard) pair scored
    for q in QUERIES:
        want = _mirror_cori(q["terms"])
        for shard in (0, 1):
            assert got[(q["qid"], shard)][1] == pytest.approx(
                want[shard], abs=1e-9
            )
        # rank consistency with the mirror (shard asc tie-break)
        order = sorted(
            range(2), key=lambda s: (-want[s], s)
        )
        assert [got[(q["qid"], s)][0] for s in order] == [1, 2]


def test_cori_routes_topically(spark, shards):
    """'zeta' lives only in shard 1 -> CORI must rank shard 1 first;
    a term missing everywhere scores the default belief on both."""
    r = {
        (int(x["qid"]), int(x["rank"])): int(x["shard"])
        for x in rank_shards_cori(shards, QUERIES).collect()
    }
    assert r[(2, 1)] == 1
    # qid 3: both shards score exactly b; tie-break shard asc
    scores = {
        int(x["shard"]): float(x["score"])
        for x in rank_shards_cori(shards, [QUERIES[2]]).collect()
    }
    assert scores[0] == scores[1] == pytest.approx(0.4, abs=1e-9)
    assert r[(3, 1)] == 0


def test_selective_all_shards_is_exhaustive(spark, shards):
    sel = run_queries_selective(shards, QUERIES, k=10, n_select=2)
    full = run_queries_sharded(shards, QUERIES, k=10)
    key = lambda r: (r["qid"], r["rank"], r["shard"], r["docid"],
                     round(r["score"], 9))
    assert sorted(map(key, sel.collect())) == sorted(map(key, full.collect()))
    assert sel.count() > 0


def test_selective_scores_match_exhaustive_on_selected(spark, shards):
    """n_select=1: results == exhaustive results filtered to each
    query's selected shard and re-ranked — global statistics intact."""
    pairs = {
        (int(r["qid"]), int(r["shard"]))
        for r in rank_shards_cori(shards, QUERIES)
        .where("rank = 1").collect()
    }
    full = [
        r for r in run_queries_sharded(shards, QUERIES, k=100).collect()
        if (r["qid"], r["shard"]) in pairs
    ]
    want = {}
    for qid in sorted({r["qid"] for r in full}):
        rows = sorted(
            (r for r in full if r["qid"] == qid),
            key=lambda r: (-r["score"], r["shard"], r["docid"]),
        )
        for rank, r in enumerate(rows[:10], start=1):
            want[(qid, rank)] = (r["shard"], r["docid"],
                                 round(r["score"], 9))
    got = {
        (int(r["qid"]), int(r["rank"])): (
            int(r["shard"]), int(r["docid"]), round(float(r["score"]), 9)
        )
        for r in run_queries_selective(
            shards, QUERIES, k=10, n_select=1
        ).collect()
    }
    assert got == want and len(got) > 0


def test_selection_guards(spark, shards):
    with pytest.raises(ValueError, match="n_select"):
        run_queries_selective(shards, QUERIES, n_select=0)
    with pytest.raises(ValueError, match="belief"):
        rank_shards_cori(shards, QUERIES, b=1.5)
    with pytest.raises(ValueError, match="out of range"):
        run_queries_sharded(shards, QUERIES, selected_pairs=[(1, 7)])
    with pytest.raises(ValueError, match="at least one shard"):
        rank_shards_cori([], QUERIES)
