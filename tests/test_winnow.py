"""Winnowing fingerprints + clone pairs (pipeline/winnow.py — the
MOSS algorithm, Schleimer et al. SIGMOD'03).

Three independent formulations must agree on the selected
fingerprints: the shipped mapInPandas/NumPy kernel, the DuckDB
window-function twin, and a brute-force pure-Python per-window loop.
The clone-pair path must realize the winnowing guarantee (a shared
passage of length >= k + w - 1 produces shared fingerprints) with the
LSH-style bucket cap + ledger discipline."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.pipeline.winnow import (
    winnow_clone_pairs,
    winnow_fingerprints,
    winnow_skipped_fps,
    winnow_sql_duckdb,
)

K, W = 8, 4


def brute_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, str]]:
    """Per-window loop: min hash, rightmost tie — the spec."""
    n = len(text) - k + 1
    if n < w:
        return set()
    hs = [
        hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()
        for i in range(n)
    ]
    sel = set()
    for i in range(n - w + 1):
        m = min(hs[i : i + w])
        p = max(j for j in range(i, i + w) if hs[j] == m)
        sel.add((p + 1, m))
    return sel


@pytest.fixture(scope="module")
def win_corpus(spark):
    return synthesize_corpus(spark, 80, seed=7, n_partitions=4).cache()


@pytest.fixture(scope="module")
def win_pdf(win_corpus):
    return winnow_fingerprints(
        win_corpus, k=K, w=W, text_col="content"
    ).toPandas()


def test_matches_brute_force(win_corpus, win_pdf):
    docs = {r["doc_id"]: r["content"] for r in win_corpus.collect()}
    got = {
        did: set(zip(g["pos"], g["fp"]))
        for did, g in win_pdf.groupby("doc_id")
    }
    checked = 0
    for did, text in docs.items():
        exp = brute_winnow(text)
        assert got.get(did, set()) == exp, f"doc {did}"
        checked += len(exp)
    assert checked > 1000  # the comparison is not vacuous


def test_matches_duckdb_window_formulation(win_corpus, win_pdf):
    pdf = win_corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    twin = con.sql(
        winnow_sql_duckdb("docs", k=K, w=W, text_col="content")
    ).df()
    key = ["doc_id", "pos", "fp"]
    a = win_pdf[key].sort_values(key).reset_index(drop=True)
    b = twin[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_shared_passage_guarantee_and_short_doc(spark):
    # any shared substring of length k + w - 1 must yield a shared
    # fingerprint; a doc with fewer than w k-grams selects nothing
    shared = "QWERTYUIOPA"  # k + w - 1 = 11 chars
    # flanking chars chosen distinct across docs so the maximal
    # shared substring is exactly " QWERTYUIOPA " (space-delimited)
    df = spark.createDataFrame(
        [
            (1, "left padding textX " + shared + " Yone tail here"),
            (2, "completely other startZ " + shared + " Wother end"),
            (3, "short doc!"),  # 3 grams < w
        ],
        "doc_id long, text string",
    )
    pdf = winnow_fingerprints(df, k=K, w=W).toPandas()
    f1 = set(pdf[pdf.doc_id == 1]["fp"])
    f2 = set(pdf[pdf.doc_id == 2]["fp"])
    assert f1 & f2, "shared 11-char passage produced no shared fp"
    assert (pdf.doc_id == 3).sum() == 0
    # and every shared fp hashes a gram inside the shared passage
    ext = " " + shared + " "
    grams = {
        hashlib.md5(ext[i : i + K].encode()).hexdigest()
        for i in range(len(ext) - K + 1)
    }
    assert (f1 & f2) <= grams


def test_clone_pairs_planted(spark):
    # 3 clones sharing a 64-char block + unique tails; 2 unrelated
    block = hashlib.md5(b"blk").hexdigest() + hashlib.md5(b"blk2").hexdigest()
    rows = [(i, block + f" unique tail number {i} " + ("z%d " % i) * 10)
            for i in (1, 2, 3)]
    rows += [(9, "nothing in common here at all with anything else q"),
             (10, "and this one is also entirely unrelated material x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W)
    pairs = winnow_clone_pairs(fps, min_shared=5).toPandas()
    got = {(a, b) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert (pairs.n_shared >= 5).all()


def test_clone_bucket_cap_and_ledger(spark):
    # a fingerprint shared by all M docs is boilerplate: with
    # max_bucket < M it must produce no pairs, and the ledger must
    # name it; with the cap off the M^2 pairs appear
    block = hashlib.md5(b"boiler").hexdigest() * 2
    df = spark.createDataFrame(
        [(i, block + f" tail {i} " + ("w%d " % i) * 8) for i in range(6)],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=K, w=W).persist()
    capped = winnow_clone_pairs(fps, min_shared=3, max_bucket=3).toPandas()
    assert capped.empty
    ledger = winnow_skipped_fps(fps, max_bucket=3).toPandas()
    # boundary windows may select a boilerplate gram in only SOME
    # docs (the tail influences the min near the block edge), so the
    # ledger carries bucket sizes in (cap, n_docs]; the fully-shared
    # interior grams must appear at the full 6
    assert len(ledger) > 0 and (ledger.n_docs > 3).all()
    assert (ledger.n_docs == 6).any()
    uncapped = winnow_clone_pairs(fps, min_shared=3, max_bucket=None)
    assert uncapped.count() == 15  # C(6,2)
    fps.unpersist()


def test_fingerprint_plan_is_map_only(spark, win_corpus):
    plan = winnow_fingerprints(win_corpus, text_col="content") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_guards(spark, win_corpus):
    with pytest.raises(ValueError, match="k >= 2"):
        winnow_fingerprints(win_corpus, k=1, text_col="content")
    with pytest.raises(ValueError, match="min_shared"):
        winnow_clone_pairs(
            winnow_fingerprints(win_corpus, text_col="content"),
            min_shared=0,
        )


def test_clone_groups_composition(spark):
    # pairs -> connected components: two planted clone families and
    # an isolated doc; transitive closure merges A-B, B-C into one
    # cluster even if A-C alone were weaker
    import hashlib as _h

    from terrier_ef_spark.pipeline.clusters import dedup_clusters

    blk1 = _h.md5(b"g1").hexdigest() + _h.md5(b"g1b").hexdigest()
    blk2 = _h.md5(b"g2").hexdigest() + _h.md5(b"g2b").hexdigest()
    rows = [(i, blk1 + f" tail {i} " + ("a%d " % i) * 8) for i in (1, 2, 3)]
    rows += [(7, blk2 + " tx " + "b1 " * 8), (8, blk2 + " ty " + "b2 " * 8)]
    rows += [(9, "isolated document with nothing shared at all q w e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W)
    pairs = winnow_clone_pairs(fps, min_shared=5).select("doc_a", "doc_b")
    cc = dedup_clusters(df, edges=pairs).toPandas()
    got = {r.doc_id: (r.cluster_id, r.keep) for r in cc.itertuples()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 8: (7, False),
    }
    assert 9 not in got  # isolated docs are implicitly kept


def test_poly_mode_mirror_guarantee_and_speed(spark, win_corpus):
    # brute-force mirror of the poly arithmetic
    import numpy as np

    from terrier_ef_spark.pipeline.winnow import _POLY_B, _winnow_one_poly

    def brute_poly(text, k=K, w=W):
        codes = [ord(c) for c in text]
        n = len(codes) - k + 1
        if n < w:
            return set()
        B = int(_POLY_B)
        hs = []
        for i in range(n):
            h = 0
            for c in codes[i : i + k]:
                h = (h * B + c) % (1 << 64)
            hs.append(h)
        sel = set()
        for i in range(n - w + 1):
            m = min(hs[i : i + w])
            p = max(j for j in range(i, i + w) if hs[j] == m)
            sel.add((p + 1, format(m, "016x")))
        return sel

    docs = {r["doc_id"]: r["content"] for r in win_corpus.limit(20).collect()}
    for did, text in docs.items():
        assert set(_winnow_one_poly(text, K, W)) == brute_poly(text), did

    # shared-passage guarantee holds for any gram hash
    s = " QWERTYUIOPA "
    a = set(_winnow_one_poly("xxA" + s + "Btail one", K, W))
    b = set(_winnow_one_poly("yyC" + s + "Dother yet", K, W))
    assert {f for _, f in a} & {f for _, f in b}

    # and the DataFrame path accepts the mode; md5/poly never mix
    pdf = winnow_fingerprints(
        win_corpus, k=K, w=W, text_col="content", hash_fn="poly"
    ).toPandas()
    assert (pdf.fp.str.len() == 16).all()
    with pytest.raises(ValueError, match="hash_fn"):
        winnow_fingerprints(win_corpus, text_col="content", hash_fn="sha")


def test_winnow_guarantee_property():
    """Property (Hypothesis): for ANY two texts sharing an injected
    common substring of length >= k + w - 1, both winnowing modes
    select at least one shared fingerprint — the MOSS guarantee,
    kernel-only (no Spark), random flanks and random shared cores."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from terrier_ef_spark.pipeline.winnow import (
        _winnow_one,
        _winnow_one_poly,
    )

    alpha = st.text(
        alphabet="abcdefghij XYZ", min_size=0, max_size=60
    )
    core = st.text(
        alphabet="nopqrstuvw", min_size=K + W - 1, max_size=30
    )

    @settings(max_examples=60, deadline=None)
    @given(pre1=alpha, post1=alpha, pre2=alpha, post2=alpha, c=core)
    def check(pre1, post1, pre2, post2, c):
        t1 = pre1 + c + post1
        t2 = pre2 + c + post2
        for fn in (_winnow_one, _winnow_one_poly):
            f1 = {f for _, f in fn(t1, K, W)}
            f2 = {f for _, f in fn(t2, K, W)}
            assert f1 & f2, (t1, t2, fn.__name__)
        # density sanity on the longer text: selections exist and
        # never exceed the window-start count
        n = len(t1) - K + 1
        assert 0 < len(_winnow_one(t1, K, W)) <= n - W + 1

    check()
