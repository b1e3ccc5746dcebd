"""Quantized impact index (index/impact.py): build-time quantization
of BM25 contributions, docid-blob byte-reuse, EF impact-stream
roundtrip, integer-sum retrieval, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.index.impact import (
    ImpactIndex,
    build_impact_index,
    decode_impacts,
    run_queries_impact,
)

DOCS = {
    0: "table cable common spark spark",
    1: "table common value",
    2: "spark common merge merge merge",
    3: "common value value",
    4: "orange banana",
}


@pytest.fixture(scope="module")
def impact_setup(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    root = tmp_path_factory.mktemp("impact")
    idx = build_index(
        spark, corpus, str(root / "idx"), log2_quantum=3, n_partitions=2
    )
    imp = build_impact_index(idx, str(root / "imp"), bits=8)
    return idx, imp


def _py_quantized(bits=8):
    """Clean-room quantization mirror over the DOCS fixture."""
    from terrier_ef_spark.oracle import OracleIndex

    o = OracleIndex({d: t.split() for d, t in DOCS.items()})
    contribs = {}
    for t, plist in o.postings.items():
        for d, tf in plist:
            contribs[(t, d)] = max(0.0, round(o.score(t, d, tf), 6))
    gmax = max(contribs.values())
    levels = (1 << bits) - 1
    return {
        k: 1 + math.floor(c / gmax * levels) for k, c in contribs.items()
    }, gmax


def test_roundtrip_matches_python_mirror(spark, impact_setup):
    _, imp = impact_setup
    want, gmax = _py_quantized()
    got = {
        (r.term, r.docid): r.impact for r in decode_impacts(imp).collect()
    }
    assert got == want
    assert imp.stats["impact_gmax"] == pytest.approx(gmax, abs=0)
    assert imp.stats["impact_bits"] == 8
    # the max-contribution posting hits the top of the range, 2^bits
    assert max(got.values()) == 256


def test_negative_idf_floors_to_quantum_min(spark, impact_setup):
    _, imp = impact_setup
    # 'common' is in 4/5 docs: BM25 idf = log2((5-4+.5)/(4+.5)) < 0,
    # so every 'common' posting floors to impact 1
    rows = decode_impacts(imp, ["common"]).collect()
    assert len(rows) == 4 and all(r.impact == 1 for r in rows)


def test_docid_blobs_byte_reused(spark, impact_setup):
    idx, imp = impact_setup
    src = {
        (r.term, r.block_id): bytes(r.docids_ef)
        for r in idx.postings.select("term", "block_id", "docids_ef").collect()
    }
    out = {
        (r.term, r.block_id): bytes(r.docids_ef)
        for r in imp.postings.select("term", "block_id", "docids_ef").collect()
    }
    assert out == src  # byte-identical, never re-encoded


def test_impact_retrieval_is_integer_sum(spark, impact_setup):
    _, imp = impact_setup
    q, _ = _py_quantized()
    got = run_queries_impact(
        imp, [{"qid": 1, "terms": ["table", "spark"]}], k=10
    ).collect()
    want = {}
    for (t, d), v in q.items():
        if t in ("table", "spark"):
            want[d] = want.get(d, 0) + v
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.rank, r.docid, r.score) for r in sorted(got, key=lambda r: r.rank)] \
        == [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]


def test_loader_and_guards(spark, impact_setup, tmp_path):
    idx, imp = impact_setup
    # reopening from disk works and validates the format tag
    re = ImpactIndex(spark, imp.root)
    assert re.stats == imp.stats
    with pytest.raises(ValueError):
        build_impact_index(idx, str(tmp_path / "x"), bits=0)
    with pytest.raises(ValueError):
        run_queries_impact(imp, [{"qid": 1, "terms": ["x"]}], k=0)
    with pytest.raises(ValueError):
        run_queries_impact(imp, [{"qid": 1, "terms": []}])


def test_tombstoned_index_refused(spark, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.index.maintenance import delete_docs

    rows = [("r", f"f{d}", "c0", "t", t, d) for d, t in sorted(DOCS.items())]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    root = tmp_path_factory.mktemp("impact_del")
    idx = build_index(
        spark, corpus, str(root / "idx"), log2_quantum=3, n_partitions=2
    )
    delete_docs(idx, [0])
    with pytest.raises(ValueError, match="tombstone"):
        build_impact_index(idx, str(root / "imp"))


def test_impact_serving_cache_identity(impact_setup):
    """enable_serving_cache pins the postings; decoded rows and query
    results are identical before and after."""
    idx, imp = impact_setup
    q = [{"qid": 1, "terms": ["spark", "table"]}]
    before = sorted(
        (r["qid"], r["rank"], r["docid"], r["score"])
        for r in run_queries_impact(imp, q, k=5).collect()
    )
    imp.enable_serving_cache()
    try:
        assert imp.postings.is_cached
        after = sorted(
            (r["qid"], r["rank"], r["docid"], r["score"])
            for r in run_queries_impact(imp, q, k=5).collect()
        )
        assert after == before
    finally:
        imp._postings_cached.unpersist()
        imp._postings_cached = None
