"""DSIR importance resampling (pipeline/dsir.py): hashed n-gram
feature space, smoothed bucket models, per-doc importance log-weights,
deterministic Gumbel top-n selection."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from terrier_ef_spark.pipeline.dsir import (
    _FRAC_DENOM,
    _FRAC_DIGITS,
    dsir_logweights,
    dsir_sample,
)

BUCKETS = 64
ALPHA = 0.5

DOCS = [
    (0, "alpha beta alpha"),
    (1, "alpha alpha alpha alpha"),
    (2, "gamma delta epsilon zeta"),
    (3, "alpha beta"),
    (4, "x"),          # single token: no bigram
    (5, ""),           # empty: no features at all
    (6, "gamma gamma delta"),
]
TARGET_IDS = {0, 1, 3}  # the alpha-heavy docs


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _feats(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % BUCKETS


def _expected_logweights():
    """Clean-room mirror of the DSIR weight pipeline."""
    raw_cnt: dict[int, int] = {}
    tgt_cnt: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for did, text in DOCS:
        bd = per_doc.setdefault(did, {})
        for f in _feats(text):
            b = _bucket(f)
            raw_cnt[b] = raw_cnt.get(b, 0) + 1
            bd[b] = bd.get(b, 0) + 1
            if did in TARGET_IDS:
                tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    rt = sum(raw_cnt.values())
    tt = sum(tgt_cnt.values())
    out = {}
    for did, bd in per_doc.items():
        lw = 0.0
        for b, n in bd.items():
            pt = (tgt_cnt.get(b, 0) + ALPHA) / (tt + ALPHA * BUCKETS)
            pr = (raw_cnt[b] + ALPHA) / (rt + ALPHA * BUCKETS)
            lw += n * (math.log(pt) - math.log(pr))
        out[did] = (sum(bd.values()), round(lw, 6))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(d, t, "en" if d in TARGET_IDS else "xx") for d, t in DOCS],
        "doc_id long, text string, lang string",
    )
    return docs, docs.where("lang = 'en'")


def test_logweights_match_mirror(frames):
    docs, tgt = frames
    got = {
        r["doc_id"]: (r["n_feats"], round(r["log_w"], 6))
        for r in dsir_logweights(docs, tgt, buckets=BUCKETS, alpha=ALPHA).collect()
    }
    want = _expected_logweights()
    for did, _ in DOCS:
        if did == 5:
            assert got[did] == (0, 0.0)  # empty doc: neutral
        else:
            assert got[did][0] == want[did][0], did
            assert abs(got[did][1] - want[did][1]) < 1e-6, did


def test_feature_counts(frames):
    """k tokens yield 2k-1 features (k unigrams + k-1 bigrams); a
    single-token doc has exactly 1; an empty doc 0."""
    docs, tgt = frames
    got = {
        r["doc_id"]: r["n_feats"]
        for r in dsir_logweights(docs, tgt, buckets=BUCKETS).collect()
    }
    for did, text in DOCS:
        k = len(_toks(text))
        assert got[did] == (2 * k - 1 if k else 0), (did, text)


def test_target_alignment_upweights(frames):
    """Docs that look like the target (alpha-heavy) must outweigh docs
    that do not (gamma/delta) — the whole point of DSIR."""
    docs, tgt = frames
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_logweights(docs, tgt, buckets=BUCKETS).collect()
    }
    assert got[1] > got[2]  # pure-alpha beats pure-other
    assert got[3] > got[6]


def test_sample_deterministic_and_keyed(frames, spark):
    docs, tgt = frames
    s1 = dsir_sample(docs, tgt, n=4, buckets=BUCKETS).collect()
    s2 = dsir_sample(
        docs.repartition(7), tgt, n=4, buckets=BUCKETS
    ).collect()
    assert [(r["doc_id"], r["key"]) for r in s1] == [
        (r["doc_id"], r["key"]) for r in s2
    ]
    # the key is log_w + Gumbel(md5 fraction), reconstructible exactly
    lw = {
        r["doc_id"]: r["log_w"]
        for r in dsir_logweights(docs, tgt, buckets=BUCKETS).collect()
    }
    for r in s1:
        h = hashlib.md5(f"dsir|{r['doc_id']}".encode()).hexdigest()
        u = (int(h[:_FRAC_DIGITS], 16) + 1.0) / (_FRAC_DENOM + 1.0)
        want = round(lw[r["doc_id"]] - math.log(-math.log(u)), 6)
        assert abs(r["key"] - want) < 1e-6
    # keys are returned best-first
    keys = [r["key"] for r in s1]
    assert keys == sorted(keys, reverse=True)


def test_guards(frames, spark):
    docs, tgt = frames
    with pytest.raises(ValueError, match="buckets"):
        dsir_logweights(docs, tgt, buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_logweights(docs, tgt, alpha=0.0)
    with pytest.raises(ValueError, match="n must be"):
        dsir_sample(docs, tgt, n=0)
    with pytest.raises(ValueError, match="target corpus is empty"):
        dsir_logweights(docs, docs.where("lang = 'nope'"))


def test_featureless_target_rejected(spark):
    """A target with rows but no tokenizable features has no
    distribution either — refused, not silently neutral."""
    docs = spark.createDataFrame(
        [(0, "alpha beta", "xx"), (1, "...!!!", "en")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="target corpus is empty"):
        dsir_logweights(docs, docs.where("lang = 'en'"))
