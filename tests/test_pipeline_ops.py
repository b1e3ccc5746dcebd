"""Training-data pipeline operator tests: dedup, similarity, text stats,
multimodal plumbing — verified against independent in-Python recomputation
on collected data (small scale)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog", "en", "s", 44),  # near dup
        (3, "import numpy as np def main return none", "en", "s", 40),
        (4, "zzz qqq xxx", "other", "s", 11),
        (5, "", "other", "s", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_duplicates(docs):
    from terrier_ef_spark.pipeline.dedup import exact_duplicates

    out = exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_docid"] == 0


def test_lsh_finds_near_dup_pair(docs):
    from terrier_ef_spark.pipeline.dedup import lsh_candidate_pairs, ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs  # identical docs share all bands
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares some band
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs).collect()}
    assert j[(0, 1)] == 1.0


def test_simhash_near_dups(docs):
    from terrier_ef_spark.pipeline.dedup import simhash_near_dups

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dups(docs).collect()}
    assert pairs.get((0, 1)) == 0  # identical text -> identical simhash


def test_simhash_fingerprint_matches_python(docs):
    """Bit-exact differential test of the Catalyst SimHash kernel against
    an independent per-token Python recomputation (same convention:
    h64 = big-endian int of the first 8 md5 bytes, weighted sign-sum)."""
    from terrier_ef_spark.pipeline.dedup import simhash_fingerprints

    out = {r["doc_id"]: r["sim"] for r in simhash_fingerprints(docs).collect()}

    def py_simhash(text):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        if not toks:
            return None
        v = [0] * 64
        for tok in toks:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
            for b in range(64):
                v[b] += 1 if (h >> b) & 1 else -1
        sim = sum(1 << b for b in range(64) if v[b] > 0)
        return sim - (1 << 64) if sim >= (1 << 63) else sim

    for r in docs.collect():
        expect = py_simhash(r["text"])
        if expect is None:
            assert r["doc_id"] not in out  # zero-token docs: no fingerprint
        else:
            assert out[r["doc_id"]] == expect, r["doc_id"]


def test_lsh_bucket_cap(spark):
    """A 1k-doc boilerplate cluster must not produce ~500k candidate
    pairs: the cap excludes its buckets BEFORE the self-join, and the
    skipped-buckets ledger reports them (no silent truncation)."""
    from terrier_ef_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        lsh_skipped_buckets,
    )

    boiler = "permission is hereby granted free of charge to any person obtaining a copy"
    rows = [(i, boiler, "en", "s", len(boiler)) for i in range(1000)]
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
        (1001, "alpha beta gamma delta epsilon eta", "en", "s", 34),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs = lsh_candidate_pairs(docs, max_bucket=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1000, 1001) in got            # organic near-dup survives the cap
    assert len(got) < 1000 * 999 / 2      # cluster NOT exploded quadratically
    assert all(a < 1000 or b < 1000 for a, b in got) is not None
    skipped = lsh_skipped_buckets(docs, max_bucket=100).collect()
    assert skipped and all(r["n_docs"] == 1000 for r in skipped)
    # uncapped path still available explicitly
    few = lsh_candidate_pairs(docs.where(F.col("doc_id") >= 1000), max_bucket=None)
    assert {(r["doc_a"], r["doc_b"]) for r in few.collect()} == {(1000, 1001)}


def test_fingerprint_matches_python(docs):
    from terrier_ef_spark.pipeline.textstats import fingerprint

    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}

    def py_fp(text):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        if len(toks) >= 3:
            sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            return min(hashlib.md5(s.encode()).hexdigest() for s in sh)
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    for r in docs.collect():
        assert out[r["doc_id"]] == py_fp(r["text"]), r["doc_id"]


def test_batch_cosine_topk(spark):
    from terrier_ef_spark.pipeline.similarity import batch_cosine_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    queries = vecs[:4]
    out = batch_cosine_topk(emb, queries, k=5).toPandas()
    # vectors stored as float32: compare against float32-normalized oracle
    v32 = vecs.astype(np.float32).astype(np.float64)
    v32n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = v32n @ qn.T
    for qi in range(4):
        order = np.lexsort((np.arange(200), -sims[:, qi]))[:5]
        got = out[out.qidx == qi].sort_values("rank")["vec_id"].tolist()
        assert got == order.tolist()
        assert got[0] == qi  # self is nearest


def test_ivf_kmeans_recall_clustered(spark):
    """Trained-IVF (k-means coarse quantizer, nprobe=4 of 16 cells)
    reaches recall@10 >= 0.9 vs brute force on CLUSTERED vectors — the
    workload IVF exists for. (The sf0.1 testdata embeddings are
    near-uniform random — measured same-label cosine 0.008 vs 0.000
    cross-label — where any cell-probing scheme's recall is bounded by
    the scan fraction; the uniform case is covered by the exactness
    property below.)"""
    from terrier_ef_spark.pipeline.similarity import (
        cosine_topk,
        ivf_kmeans_topk,
        kmeans_fit,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 64)) * 3
    vecs = np.concatenate(
        [c + rng.normal(size=(100, 64)) * 0.5 for c in centers]
    )
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]], int(i // 100)) for i in range(len(vecs))],
        "vec_id long, embedding array<float>, label int",
    ).persist()
    cen = kmeans_fit(emb, n_clusters=16)
    assert cen.shape == (16, 64)
    recalls = []
    for qi in range(0, 2000, 100):
        q = [float(v) for v in vecs[qi]]
        exact = {x["vec_id"] for x in cosine_topk(emb, q, 10).collect()}
        approx = {
            x["vec_id"]
            for x in ivf_kmeans_topk(emb, q, 10, centroids=cen, nprobe=4).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    # determinism: same seed -> same centroids
    assert np.array_equal(cen, kmeans_fit(emb, n_clusters=16))
    emb.unpersist()


def test_ivf_kmeans_exact_within_probed_cells(spark):
    """Exactness property on the real (uniform) sf0.1 embeddings: the
    IVF answer must equal brute force restricted to the probed cells —
    the approximation comes ONLY from the cell choice."""
    from terrier_ef_spark.pipeline.similarity import (
        cosine_topk,
        ivf_kmeans_topk,
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    cen = kmeans_fit(emb, n_clusters=16)
    row = emb.where(F.col("vec_id") == 7).collect()[0]
    q = [float(x) for x in row["embedding"]]
    qn = np.asarray(q) / np.linalg.norm(q)
    probes = np.argsort(-(cen @ qn))[:4].tolist()
    ids = {
        r["vec_id"]
        for r in kmeans_assign(emb, cen).where(F.col("cluster").isin(probes)).collect()
    }
    want = cosine_topk(emb.where(F.col("vec_id").isin(list(ids))), q, 10).collect()
    got = ivf_kmeans_topk(emb, q, 10, centroids=cen, nprobe=4).collect()
    assert [(r["vec_id"], r["cos"], r["rank"]) for r in got] == [
        (r["vec_id"], r["cos"], r["rank"]) for r in want
    ]
    assert row["vec_id"] in {r["vec_id"] for r in got}  # self is found


def test_multimodal_plumbing(spark, docs):
    from terrier_ef_spark.pipeline.multimodal import (
        extract_features,
        frame_sample,
        synthesize_media,
    )

    media = synthesize_media(docs)
    feats = extract_features(media).toPandas()
    assert len(feats) == 6
    assert set(feats.columns) == {"doc_id", "media_type", "mean_px", "std_px", "thumb"}
    assert all(len(t) == 64 for t in feats["thumb"])
    # deterministic: same payload + dims -> same features across runs
    again = extract_features(media).toPandas()
    a = feats.sort_values("doc_id")["mean_px"].tolist()
    b = again.sort_values("doc_id")["mean_px"].tolist()
    assert a == b
    fs = frame_sample(media, every_ms=1000).toPandas()
    assert (fs.groupby("doc_id").size() >= 1).all()


def test_quality_and_langid(docs):
    from terrier_ef_spark.pipeline.textstats import lang_id, quality_score

    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[5]["n_tokens"] == 0
    assert q[0]["stopword_ratio"] > 0  # 'the' twice / 9 tokens
    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert langs[0] == "en" and langs[4] == "other"


def test_embedding_near_dups_recovers_planted(spark):
    """WTA-LSH near-dup pairs == brute-force hamming+cosine over the
    planted union (candidate pigeonhole is exact, not probabilistic)."""
    from terrier_ef_spark.pipeline import similarity as sim

    rng = np.random.default_rng(7)
    n, dim = 120, 32
    x = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    allv = sim.planted_near_dup_union(emb, offset=1000, decimals=2)
    got = {
        (int(r.vec_id_a), int(r.vec_id_b), int(r.hamming))
        for r in sim.embedding_near_dups(allv).collect()
    }

    # brute force in NumPy over the same union
    xd = x.astype(np.float64)
    union = np.concatenate([xd, np.round(xd, 2)])
    ids = list(range(n)) + [i + 1000 for i in range(n)]
    pairs = sim.wta_pairs(dim)
    sig = np.stack([(union[:, p] > union[:, q]) for p, q in pairs], axis=1)
    want = set()
    for a in range(len(union)):
        for b in range(a + 1, len(union)):
            ham = int((sig[a] != sig[b]).sum())
            if ham > sim.NEAR_DUP_MAX_HAMMING:
                continue
            cos = round(
                float(union[a] @ union[b])
                / (np.linalg.norm(union[a]) * np.linalg.norm(union[b])), 6,
            )
            if cos >= sim.NEAR_DUP_MIN_COS:
                ia, ib = sorted((ids[a], ids[b]))
                want.add((ia, ib, ham))
    assert got == want
    assert len(want) > n * 0.8  # most planted copies recovered


def test_embedding_near_dup_bucket_cap(spark):
    """A 1k-vector identical cluster must not emit M^2 pairs: the cap
    excludes its buckets before the self-join and the ledger reports
    them (no silent truncation)."""
    from terrier_ef_spark.pipeline import similarity as sim

    rng = np.random.default_rng(11)
    base = rng.normal(size=16).astype(np.float64)
    rows = [(i, [float(v) for v in base]) for i in range(1000)]
    # plus a handful of distinct vectors that DO pair up via rounding
    extra = rng.normal(size=(5, 16)).astype(np.float64)
    rows += [(2000 + i, [float(v) for v in extra[i]]) for i in range(5)]
    vecs = spark.createDataFrame(rows, "vec_id long, emb array<double>")

    capped = sim.embedding_near_dups(vecs, max_bucket=64).collect()
    cluster_ids = set(range(1000))
    assert not any(
        r.vec_id_a in cluster_ids and r.vec_id_b in cluster_ids for r in capped
    )
    ledger = sim.embedding_near_dup_skipped_buckets(vecs, max_bucket=64).collect()
    assert len(ledger) >= 1 and all(r.n_vecs == 1000 for r in ledger)
    # uncapped on a small clone cluster still finds the pairs
    small = spark.createDataFrame(rows[:4] + rows[1000:], "vec_id long, emb array<double>")
    uncapped = sim.embedding_near_dups(small, max_bucket=None).collect()
    assert {(r.vec_id_a, r.vec_id_b) for r in uncapped} >= {(0, 1), (0, 2), (1, 2)}


def test_simhash_bucket_cap(spark):
    """A 1k-doc identical-fingerprint cluster must not produce ~500k
    candidate pairs (16-bit chunk keys make this the common case at
    scale): the cap excludes its buckets BEFORE the self-join, and the
    skipped-buckets ledger reports them (no silent truncation)."""
    from terrier_ef_spark.pipeline.dedup import (
        simhash_near_dups,
        simhash_skipped_buckets,
    )

    boiler = "permission is hereby granted free of charge to any person obtaining a copy"
    rows = [(i, boiler, "en", "s", len(boiler)) for i in range(1000)]
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta iota kappa", "en", "s", 47),
        (1001, "alpha beta gamma delta epsilon zeta iota kappa", "en", "s", 46),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs = simhash_near_dups(docs, max_bucket=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert len(got) < 1000 * 999 / 2        # cluster NOT exploded quadratically
    assert not any(a < 1000 and b < 1000 for a, b in got)
    skipped = simhash_skipped_buckets(docs, max_bucket=100).collect()
    # the identical cluster fills all 4 chunk buckets past the cap
    assert len(skipped) == 4 and all(r["n_docs"] == 1000 for r in skipped)
    # uncapped path still available explicitly; near-identical pair found
    few = simhash_near_dups(docs.where(F.col("doc_id") >= 1000), max_bucket=None)
    assert {(r["doc_a"], r["doc_b"]) for r in few.collect()} == {(1000, 1001)}


def test_multimodal_decoder_gating(spark, docs):
    """Decode routing: WAV/netpbm/Y4M payloads decode NATIVELY (real
    parsers, no libs needed) so 'auto' differs from the forced 'stub';
    compressed images need Pillow ('pil' raises the honest
    NotImplementedError in this container); unknown decoders rejected."""
    import pytest as _pytest

    from terrier_ef_spark.pipeline.multimodal import (
        _decode_image_pil,
        _pil_available,
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(docs)
    with _pytest.raises(ValueError):
        extract_features(media, decoder="bogus")
    a = extract_features(media, decoder="auto").toPandas()
    b = extract_features(media, decoder="stub").toPandas()
    # the payloads are valid containers, so the real decode must NOT
    # degenerate to the stub's hash-noise
    assert a.sort_values("doc_id")["mean_px"].tolist() != \
           b.sort_values("doc_id")["mean_px"].tolist()
    if not _pil_available():
        with _pytest.raises(NotImplementedError):
            _decode_image_pil(b"\x89PNG notreally")
    else:  # pragma: no cover — container has no Pillow today
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (16, 16), 128).save(buf, format="PNG")
        assert _decode_image_real(buf.getvalue()).shape == (16, 16)


def test_duplicate_span_stats(spark):
    from terrier_ef_spark.pipeline.dedup import duplicate_span_stats

    shared8 = "a b c d e f g h"          # the one 8-gram docs 0/1 share
    run9 = "p q r s t u v w x"           # 9-token run shared by docs 3/4
    rows = [
        (0, shared8 + " i j"),           # dup span [0,8) of 10 -> 0.8
        (1, "x " + shared8 + " y"),      # dup span [1,9) of 10 -> 0.8
        (2, "entirely different tokens with no shared gram at all ok"),
        (3, run9 + " k1 k2 k3"),         # overlapping grams [0,8)+[1,9)
        (4, run9 + " m1 m2 m3"),         #   must MERGE to 9, not 16
        (5, "dup doc one two three four five six seven eight nine ten"),
        (6, "dup doc one two three four five six seven eight nine ten"),
        (7, "tiny"),                     # < n tokens -> no grams
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=8).collect()}
    assert len(got) == 8  # every doc reported, including zero-dup docs
    assert (got[0]["n_tokens"], got[0]["dup_tokens"]) == (10, 8)
    assert got[0]["dup_fraction"] == pytest.approx(0.8)
    assert (got[1]["n_tokens"], got[1]["dup_tokens"]) == (10, 8)
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_fraction"] == 0.0
    # overlap merge: [0,8) U [1,9) = 9 covered tokens of 12
    assert got[3]["dup_tokens"] == 9
    assert got[3]["dup_fraction"] == pytest.approx(round(9 / 12, 6))
    assert got[4]["dup_tokens"] == 9
    # identical docs: fully covered
    assert got[5]["dup_tokens"] == got[5]["n_tokens"] == 12
    assert got[5]["dup_fraction"] == 1.0
    assert (got[7]["n_tokens"], got[7]["dup_tokens"]) == (1, 0)


def test_duplicate_span_stats_matches_duckdb(spark, tmp_path):
    """Cross-engine twin on a small planted frame (the sf0.01 gate
    re-proves this on real data)."""
    import duckdb

    from terrier_ef_spark.pipeline.dedup import (
        DUPLICATE_SPAN_STATS_SQL,
        duplicate_span_stats,
    )

    base = "one two three four five six seven eight nine ten eleven"
    rows = [(i, base + f" tail{i % 3}", "en", "s", 0) for i in range(9)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    want = {
        int(r[0]): (int(r[1]), int(r[2]), float(r[3]))
        for r in con.sql(DUPLICATE_SPAN_STATS_SQL).fetchall()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in duplicate_span_stats(spark.read.parquet(pq)).collect()
    }
    assert got == want and len(got) == 9


def test_repetition_stats_hand_values(spark):
    from terrier_ef_spark.pipeline.textstats import repetition_stats

    rows = [
        # "a b" x3 -> top 2-gram "a b" cnt=3; doc_chars=11
        (0, "a b a b a b", "en", "s", 0),
        # duplicated lines: 3 lines, "x y" twice
        (1, "x y\nz w\nx y", "en", "s", 0),
        (2, "", "en", "s", 0),
        (3, "unique words only here now", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    # doc 0: toks=6, doc_chars=11; g2 "a b":3 "b a":2 -> top=3*3/11
    assert got[0]["top_2gram_char_frac"] == pytest.approx(round(9 / 11, 6))
    # g3 tie "a b a":2 vs "b a b":2 -> lexicographically largest wins
    assert got[0]["top_3gram_char_frac"] == pytest.approx(round(10 / 11, 6))
    # g5: "a b a b a":1, "b a b a b":1 -> no dups
    assert got[0]["dup_5gram_char_frac"] == 0.0
    assert got[0]["gopher_flagged"] == 1
    # doc 1: lines ["x y","z w","x y"] -> dup occurrences 2/3, chars 6/9
    assert got[1]["dup_line_frac"] == pytest.approx(round(2 / 3, 6))
    assert got[1]["dup_line_char_frac"] == pytest.approx(round(6 / 9, 6))
    assert got[1]["gopher_flagged"] == 1
    # empty doc: all zero, unflagged
    assert got[2]["dup_line_frac"] == 0.0 and got[2]["gopher_flagged"] == 0
    # no repetition anywhere: count-1 top grams contribute 0
    assert got[3]["gopher_flagged"] == 0
    assert got[3]["top_2gram_char_frac"] == 0.0


def test_repetition_stats_matches_duckdb(spark, tmp_path):
    """Cross-engine twin incl. boilerplate-heavy docs (the sf0.01 gate
    re-proves this on real data)."""
    import duckdb

    from terrier_ef_spark.pipeline.textstats import (
        REPETITION_STATS_SQL,
        repetition_stats,
    )

    rows = []
    for i in range(12):
        body = " ".join(f"w{j % (3 + i)}" for j in range(40))
        rows.append((i, f"header line\n{body}\nheader line", "en", "s", 0))
    rows.append((12, "", "en", "s", 0))
    rows.append((13, "spark " * 30, "en", "s", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    cols = [
        "dup_line_frac",
        "dup_line_char_frac",
        "top_2gram_char_frac",
        "top_3gram_char_frac",
        "dup_5gram_char_frac",
        "gopher_flagged",
    ]
    want = {
        int(r[0]): tuple(float(x) for x in r[1:])
        for r in con.sql(REPETITION_STATS_SQL).fetchall()
    }
    got = {
        r["doc_id"]: tuple(float(r[c]) for c in cols)
        for r in repetition_stats(spark.read.parquet(pq)).collect()
    }
    assert got == want and len(got) == 14
    # the pure-repetition doc is flagged, the varied ones aren't all
    assert got[13][-1] == 1.0


def test_filter_pipeline_known_verdicts(spark):
    from terrier_ef_spark.pipeline.textstats import filter_pipeline

    good = " ".join(
        f"the item{i} has size{i} and color{i} in box{i}" for i in range(8)
    )  # 64 tokens, stopwords present, every 2-gram/3-gram/5-gram unique
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "tiny doc"),
            (2, " ".join(["spam"] * 80)),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in filter_pipeline(docs).collect()}
    assert got[0] == (True, "")
    assert got[1][0] is False and "too_few_tokens" in got[1][1]
    assert got[2][0] is False and "gopher_repetition" in got[2][1]
    assert "low_stopword" in got[2][1]  # reasons accumulate, not first-hit


def test_term_stats_and_zipf_fit_known(spark):
    import numpy as np

    from terrier_ef_spark.pipeline.textstats import term_stats, zipf_fit

    # cf: aa=8, bb=4+1, cc=2, dd=1 -> exact OLS slope over log2 space
    docs = spark.createDataFrame(
        [(0, " ".join(["aa"] * 8 + ["bb"] * 4)), (1, "cc cc bb dd")],
        "doc_id long, text string",
    )
    got = {r["term"]: (r["cf"], r["df"], r["rank"])
           for r in term_stats(docs, top_k=10).collect()}
    assert got == {"aa": (8, 1, 1), "bb": (5, 2, 2),
                   "cc": (2, 1, 3), "dd": (1, 1, 4)}

    x = np.log2([1, 2, 3, 4])
    y = np.log2([8, 5, 2, 1])
    want = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    row = zipf_fit(docs, ranks=10).collect()[0]
    assert row["n_ranks"] == 4
    assert abs(row["slope"] - round(want, 6)) < 1e-9


def test_tfidf_keywords_known(spark):
    import math

    from terrier_ef_spark.pipeline.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [(0, "aa aa bb"), (1, "bb cc"), (2, "cc cc cc dd")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
           for r in tfidf_keywords(docs, k=2).collect()}
    lg = math.log2
    # df: aa=1, bb=2, cc=2, dd=1; N=3
    assert got[(0, 1)] == ("aa", round(2 * lg(3 / 1), 6))
    assert got[(0, 2)] == ("bb", round(1 * lg(3 / 2), 6))
    assert got[(2, 1)] == ("cc", round(3 * lg(3 / 2), 6))
    assert got[(2, 2)] == ("dd", round(1 * lg(3 / 1), 6))
    # doc1: bb and cc tie at 1*log2(1.5) -> term asc breaks it
    assert got[(1, 1)][0] == "bb" and got[(1, 2)][0] == "cc"


def test_clean_corpus_recipe(spark, tmp_path):
    """End-to-end corpus prep: near-dups dropped to one canonical copy,
    quality failures dropped with attributed reasons, benchmark-
    contaminated docs dropped; survivors build a queryable index."""
    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.pipeline.recipes import clean_corpus
    from terrier_ef_spark.query.engine import run_queries

    good = " ".join(
        f"the item{i} has size{i} and color{i} in box{i}" for i in range(8)
    )
    good2 = " ".join(
        f"a part{i} with shade{i} or weight{i} near bin{i}" for i in range(8)
    )
    leak = " ".join(
        f"the riddle{i} answer{i} is secret{i} of vault{i}" for i in range(8)
    )
    rows = [
        (0, good), (1, good), (2, good),       # near-dup cluster, keep 0
        (3, good2),                            # clean survivor
        (4, "tiny doc"),                       # quality failure
        (5, leak),                             # contaminated vs bench
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(900, leak)], "doc_id long, text string")

    survivors, ledger = clean_corpus(docs, bench=bench)
    kept = {r["doc_id"] for r in survivors.collect()}
    dropped = {r["doc_id"]: r["dropped_by"] for r in ledger.collect()}
    assert kept == {0, 3}
    assert dropped[1] == "near_duplicate" and dropped[2] == "near_duplicate"
    assert dropped[4].startswith("quality:") and "too_few_tokens" in dropped[4]
    assert dropped[5] == "contaminated"

    corpus = survivors.select(
        F.lit("r").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("c0").alias("commit"), F.lit("t").alias("lang"),
        F.col("text").alias("content"), "doc_id",
    )
    idx = build_index(spark, corpus, str(tmp_path / "clean"),
                      block_bits=4, n_partitions=2)
    res = run_queries(
        idx, [{"qid": 1, "terms": ["item0", "part0"], "mode": "disjunctive"}],
        k=5, strategy="term_major",
    ).collect()
    assert {r["docid"] for r in res} == {0, 3}


def test_unblocked_build_refuses_sparse_doc_ids(spark, tmp_path):
    from terrier_ef_spark.index.builder import build_index

    corpus = spark.createDataFrame(
        [("r", "p0", "c", "t", "alpha beta", 0),
         ("r", "p5", "c", "t", "beta gamma", 5)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    with pytest.raises(ValueError, match="sparse"):
        build_index(spark, corpus, str(tmp_path / "sparse"), n_partitions=2)
    # blocked build handles the same sparse ids fine
    idx = build_index(spark, corpus, str(tmp_path / "sparse_b"),
                      block_bits=2, n_partitions=2)
    assert idx.stats["num_docs"] == 2


def test_doc_perplexity_known(spark):
    """doc_perplexity vs a hand-computed unigram cross-entropy, plus
    the filtering property: a doc matching the corpus head scores
    lower perplexity than a doc of corpus-rare terms."""
    import math

    from terrier_ef_spark.pipeline.textstats import doc_perplexity

    docs = spark.createDataFrame(
        [(0, "aa aa aa bb"), (1, "aa bb bb cc"), (2, "dd dd ee ff")],
        "doc_id long, text string",
    )
    # cf: aa=4, bb=3, cc=1, dd=2, ee=1, ff=1; C=12
    cf = {"aa": 4, "bb": 3, "cc": 1, "dd": 2, "ee": 1, "ff": 1}
    C = 12.0
    toks = {0: ["aa"] * 3 + ["bb"], 1: ["aa", "bb", "bb", "cc"],
            2: ["dd", "dd", "ee", "ff"]}
    got = {r["doc_id"]: r for r in doc_perplexity(docs).collect()}
    for d, tk in toks.items():
        h = -sum(math.log2(cf[t] / C) for t in tk) / len(tk)
        assert got[d]["n_tokens"] == len(tk)
        assert got[d]["cross_entropy"] == pytest.approx(round(h, 6), abs=1e-9)
        assert got[d]["perplexity"] == pytest.approx(round(2 ** h, 6), abs=1e-6)
    # head-matching doc 0 < mixed doc 1 < rare-term doc 2
    assert (got[0]["perplexity"] < got[1]["perplexity"]
            < got[2]["perplexity"])


def test_doc_perplexity_excludes_empty(spark):
    from terrier_ef_spark.pipeline.textstats import doc_perplexity

    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "???")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in doc_perplexity(docs).collect()}
    assert ids == {0}


def test_curate_training_corpus_recipe(spark):
    """Full curation composition: cleaning -> DSIR selection ->
    mixture sampling -> packing, with every entering doc either a
    survivor or carrying an attributed drop row."""
    from terrier_ef_spark.pipeline.recipes import curate_training_corpus

    def _long(tag, i0=0):
        return " ".join(
            f"the {tag}{i} has part{i} and value{i} in slot{i}"
            for i in range(i0, i0 + 8)
        )

    rows = [(d, _long(f"w{d}"), "en" if d % 2 == 0 else "de")
            for d in range(10)]
    rows.append((10, rows[0][1], "en"))   # near-dup of doc 0
    rows.append((11, "tiny doc", "en"))   # quality failure
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = docs.where("lang = 'en' AND doc_id < 4")

    selected, ledger = curate_training_corpus(
        docs, target=target, select_n=6, dsir_buckets=64,
        mixture_by="lang", temperature=2.0, budget_frac=0.9,
    )
    kept = {r["doc_id"] for r in selected.collect()}
    dropped = {r["doc_id"]: r["dropped_by"] for r in ledger.collect()}
    # full attribution: every doc is kept XOR dropped
    assert kept.isdisjoint(dropped)
    assert kept | set(dropped) == {r[0] for r in rows}
    assert dropped[11].startswith("quality:")
    assert "near_duplicate" in {dropped.get(0), dropped.get(10)}
    assert sum(1 for v in dropped.values() if v == "dsir_rejected") >= 1
    # packing stage: block table instead of docs
    packed, ledger2 = curate_training_corpus(
        docs, target=target, select_n=6, dsir_buckets=64, seq_len=16,
    )
    assert {"chunk_id", "doc_id", "doc_start", "doc_end"} <= set(
        packed.columns
    )
    # guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="BOTH target and select_n"):
        curate_training_corpus(docs, target=target)
