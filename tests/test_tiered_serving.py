"""Multi-tier serving with coverage fallback (query/tiered.py):
tier-vs-full routing, result provenance, identity properties, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.query.engine import run_queries
from terrier_ef_spark.query.tiered import run_queries_tiered

DOCS = {
    0: "common common rare1",
    1: "common common common",
    2: "common rare2",
    3: "common common common common",
    4: "common other",
    5: "other other rare1",
}

QUERIES = [
    {"qid": 1, "terms": ["common"]},          # big list: tier covers
    {"qid": 2, "terms": ["rare1"]},           # tiny list: falls back
    {"qid": 3, "terms": ["common", "rare2"]},
]


@pytest.fixture(scope="module")
def tiers(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.prune import prune_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    root = tmp_path_factory.mktemp("tiered")
    full = build_index(
        spark, corpus, str(root / "full"), block_bits=16, n_partitions=2
    )
    tier = prune_index(full, str(root / "tier"), 3, n_partitions=2)
    return tier, full


def _by_qid(df):
    out = {}
    for r in df.orderBy("qid", "rank").collect():
        out.setdefault(r["qid"], []).append(
            (r["rank"], r["docid"], round(r["score"], 6), r["tier"])
        )
    return out


def test_fallback_routing_and_parity(tiers):
    tier, full = tiers
    k = 3
    got = _by_qid(run_queries_tiered(tier, full, QUERIES, k=k))
    # qid 1: 'common' kept-list has 3 docs -> full tier page, served
    # from the pruned tier and identical to querying the tier directly
    assert all(t == "pruned" for *_, t in got[1])
    tier_direct = _by_qid(
        run_queries(tier, [QUERIES[0]], k=k, strategy="term_major")
        .withColumn("tier", F.lit("pruned"))
    )
    assert got[1] == tier_direct[1]
    # qid 2: 'rare1' matches 2 docs (< k) -> full-index results
    assert all(t == "full" for *_, t in got[2])
    full_direct = _by_qid(
        run_queries(full, [QUERIES[1]], k=k, strategy="term_major")
        .withColumn("tier", F.lit("full"))
    )
    assert got[2] == full_direct[2]


def test_full_coverage_never_falls_back(tiers):
    tier, full = tiers
    got = _by_qid(run_queries_tiered(tier, full, [QUERIES[0]], k=1))
    assert all(t == "pruned" for *_, t in got[1])


def test_everything_falls_back_at_large_k(tiers):
    tier, full = tiers
    got = _by_qid(run_queries_tiered(tier, full, QUERIES, k=len(DOCS)))
    for qid in (1, 2, 3):
        assert all(t == "full" for *_, t in got[qid]), qid


def test_tiered_guards(tiers, spark, tmp_path):
    tier, full = tiers
    with pytest.raises(ValueError, match="k must be"):
        run_queries_tiered(tier, full, QUERIES, k=0)
    with pytest.raises(ValueError, match="no queries"):
        run_queries_tiered(tier, full, [], k=1)
    # a tier from a different corpus is refused
    from terrier_ef_spark.index.builder import build_index

    other = build_index(
        spark,
        spark.createDataFrame(
            [("r", "f0", "c0", "t", "lone doc words", 0)],
            "repo string, path string, commit string, lang string,"
            " content string, doc_id long",
        ),
        str(tmp_path / "other"), n_partitions=2,
    )
    with pytest.raises(ValueError, match="does not derive"):
        run_queries_tiered(other, full, QUERIES, k=1)
