"""Bigram-LM perplexity filter (pipeline/textstats.py
doc_perplexity_bigram): smoothed collection bigram model, per-doc
cross-entropy, exclusions, ordering properties."""

from __future__ import annotations

import math

import pytest

from terrier_ef_spark.pipeline.textstats import doc_perplexity_bigram

ALPHA = 0.5

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "the cat sat on the mat again and again"),
    (3, "zebra quark flux"),     # bigrams unique to this doc
    (4, "single"),               # 1 token: no bigrams
    (5, ""),                     # empty
]


def _toks(t):
    return [x for x in t.lower().split() if x]


def _expected():
    c12: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    vocab = set()
    for did, text in DOCS:
        t = _toks(text)
        vocab.update(t)
        if len(t) < 2:
            continue
        bd = per_doc.setdefault(did, {})
        for a, b in zip(t, t[1:]):
            bg = f"{a} {b}"
            c12[bg] = c12.get(bg, 0) + 1
            bd[bg] = bd.get(bg, 0) + 1
    c1: dict[str, int] = {}
    for bg, c in c12.items():
        w1 = bg.split(" ", 1)[0]
        c1[w1] = c1.get(w1, 0) + c
    v = len(vocab)
    out = {}
    for did, bd in per_doc.items():
        nb = sum(bd.values())
        s = 0.0
        for bg, tf in bd.items():
            w1 = bg.split(" ", 1)[0]
            p = (c12[bg] + ALPHA) / (c1[w1] + ALPHA * v)
            s += tf * math.log2(p)
        h = -s / nb
        out[did] = (nb, round(h, 6), round(2.0**h, 6))
    return out


@pytest.fixture(scope="module")
def ppl_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in doc_perplexity_bigram(docs, alpha=ALPHA).collect()
    }


def test_matches_hand_mirror(ppl_rows):
    want = _expected()
    assert set(ppl_rows) == set(want)
    for did, (nb, h, p) in want.items():
        gnb, gh, gp = ppl_rows[did]
        assert gnb == nb, did
        assert abs(gh - h) < 1e-6, did
        assert abs(gp - p) < 2e-5, did


def test_short_docs_excluded(ppl_rows):
    assert 4 not in ppl_rows and 5 not in ppl_rows


def test_common_bigrams_score_lower(ppl_rows):
    """'the cat sat …' repeats across docs; doc 3's bigrams are unique
    to it — the out-of-distribution doc must carry higher perplexity."""
    assert ppl_rows[0][2] < ppl_rows[3][2]
    assert ppl_rows[1][2] < ppl_rows[3][2]


def test_alpha_guard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha"):
        doc_perplexity_bigram(docs, alpha=0.0)
