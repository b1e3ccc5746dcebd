"""Product quantization: numpy-reference codes, ADC score identity,
trained-codebook quality, cross-engine twin."""

import duckdb
import numpy as np
import pytest

from terrier_ef_spark.pipeline import pq


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _np_codes(vecs, cb):
    m, ksub, dsub = cb.shape
    v = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    out = []
    for j in range(m):
        x = v[:, j * dsub : (j + 1) * dsub]
        d2 = ((x[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
        out.append(d2.argmin(axis=1))
    return np.stack(out, axis=1)


def test_pq_codes_match_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(64, 16)).astype(np.float32)
    cb = pq.pq_codebooks(16, m=4, ksub=8)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode(_emb_df(spark, vecs), cb).collect()
    }
    want = _np_codes(vecs, cb)
    assert all(got[i] == list(want[i]) for i in range(len(vecs)))


def test_pq_adc_score_matches_numpy(spark):
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(32, 16)).astype(np.float32)
    q = [float(x) for x in rng.normal(size=16)]
    cb = pq.pq_codebooks(16, m=4, ksub=8)
    got = {
        r["vec_id"]: r["score"]
        for r in pq.ann_pq_adc_topk(
            _emb_df(spark, vecs), q, k=32, codebooks=cb
        ).collect()
    }
    codes = _np_codes(vecs, cb)
    tabs = pq._adc_tables(q, cb)
    for i in range(len(vecs)):
        want = round(sum(tabs[j][codes[i][j]] for j in range(4)), 6)
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_pq_trained_beats_pinned(spark):
    """Lloyd-trained codebooks reconstruct a clustered sample with
    lower squared error than the pinned random codebooks."""
    rng = np.random.default_rng(5)
    centers = rng.normal(scale=2.0, size=(6, 16))
    vecs = (
        centers[rng.integers(0, 6, size=300)]
        + rng.normal(scale=0.05, size=(300, 16))
    ).astype(np.float32)
    df = _emb_df(spark, vecs)
    pinned = pq.pq_codebooks(16, m=4, ksub=8)
    trained = pq.pq_train_codebooks(df, m=4, ksub=8, iters=8)

    def sqerr(cb):
        codes = _np_codes(vecs, cb)
        v = vecs.astype(np.float64)
        err = 0.0
        for j in range(4):
            x = v[:, j * 4 : (j + 1) * 4]
            err += ((x - cb[j][codes[:, j]]) ** 2).sum()
        return err

    assert sqerr(trained) < 0.5 * sqerr(pinned)


def test_pq_matches_duckdb(spark, tmp_path):
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    df = _emb_df(spark, vecs)
    pqt = str(tmp_path / "emb.parquet")
    df.write.mode("overwrite").parquet(pqt)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{pqt}/*.parquet'")
    cb = pq.pq_codebooks(16, m=4, ksub=8)
    q = [float(x) for x in vecs[0]]
    emb = spark.read.parquet(pqt)
    got_codes = {
        r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(emb, cb).collect()
    }
    want_codes = {
        int(r[0]): list(r[1]) for r in con.sql(pq.pq_encode_sql(16, cb)).fetchall()
    }
    assert got_codes == want_codes
    got = sorted(
        (r["vec_id"], r["score"], r["rank"])
        for r in pq.ann_pq_adc_topk(emb, q, codebooks=cb).collect()
    )
    want = sorted(
        (int(a), float(b), int(c))
        for a, b, c in con.sql(pq.ann_pq_adc_sql(q, codebooks=cb)).fetchall()
    )
    assert got == want and len(got) == 10
    # the query vector itself lands rank 1 (its own reconstruction
    # maximizes the quantized inner product on this sample)
    assert got[0][0] == 0 and got[0][2] == 1


def test_pq_rejects_bad_dim():
    with pytest.raises(ValueError):
        pq.pq_codebooks(10, m=4)
