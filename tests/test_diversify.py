"""MMR diversified top-k vs a clean-room greedy mirror; the
diversity-beats-redundancy property on a planted near-dup cluster."""

import numpy as np
import pytest

from terrier_ef_spark.pipeline.diversify import mmr_topk

LAM = 0.7


def _mirror(vecs, q, k, pool, lam):
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = np.array(q) / np.linalg.norm(q)
    cos = np.round(v @ qn, 6)  # cosine_topk rounds to 6dp
    order = np.lexsort((np.arange(len(vecs)), -cos))[:pool]
    ids, rel = order, cos[order]
    sims = v[order] @ v[order].T
    selected, scores = [], []
    red = np.full(len(ids), -np.inf)
    for _ in range(k):
        mmr = lam * rel - (1 - lam) * red if selected else lam * rel
        mmr = mmr.copy()
        mmr[selected] = -np.inf
        best = int(np.lexsort((ids, -mmr))[0])
        selected.append(best)
        scores.append(float(mmr[best]))
        red = np.maximum(red, sims[:, best])
    return [(int(ids[i]), round(s, 6)) for i, s in zip(selected, scores)]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # 30 random vectors + a planted clump of 5 near-identical vectors
    # that are all highly similar to the query
    base = rng.normal(size=(30, 16))
    anchor = rng.normal(size=16)
    clump = anchor + rng.normal(size=(5, 16)) * 0.01
    vecs = np.concatenate([base, clump])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    return df, vecs, anchor


def test_mmr_matches_mirror(spark, emb):
    df, vecs, anchor = emb
    q = [float(x) for x in anchor]
    got = [
        (int(r["vec_id"]), float(r["mmr"]))
        for r in mmr_topk(df, q, k=8, pool=20, lam=LAM)
        .orderBy("rank").collect()
    ]
    # engine stores float32 embeddings: mirror on the float32-cast vectors
    want = _mirror(vecs.astype(np.float32).astype(np.float64), q, 8, 20, LAM)
    assert [i for i, _ in got] == [i for i, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want], atol=1e-6)


def test_mmr_spreads_the_clump(spark, emb):
    df, vecs, anchor = emb
    q = [float(x) for x in anchor]
    plain = {int(r["vec_id"])
             for r in mmr_topk(df, q, k=5, pool=20, lam=1.0).collect()}
    diverse = {int(r["vec_id"])
               for r in mmr_topk(df, q, k=5, pool=20, lam=0.3).collect()}
    clump_ids = set(range(30, 35))
    # lam=1 (pure relevance) fills top-5 with the planted clump;
    # diversification must break it up
    assert len(plain & clump_ids) == 5
    assert len(diverse & clump_ids) < 5


def test_mmr_guards(spark, emb):
    df, _, anchor = emb
    q = [float(x) for x in anchor]
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(df, q, k=3, lam=1.5)
    with pytest.raises(ValueError, match="pool"):
        mmr_topk(df, q, k=30, pool=10)
