"""Porter stemmer: algorithm vectors + stemmed-index lexicon oracle.

Vectors are full-algorithm outputs (Porter 1980 examples continued
through all steps — e.g. 'electrical' passes step 3 to 'electric' and
step 4 to 'electr', matching the canonical Snowball porter sample
vocabulary)."""

from __future__ import annotations

import pytest

from terrier_ef_spark.stemmer import porter_stem

VECTORS = {
    # step 1
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    # steps 2-4 (full-algorithm outputs)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words unchanged
    "a": "a", "is": "is", "be": "be",
}


def test_porter_vectors():
    bad = {w: (porter_stem(w), e) for w, e in VECTORS.items() if porter_stem(w) != e}
    assert not bad, bad


def test_stemmed_index_lexicon_matches_hand_stemmed_oracle(spark, tmp_path):
    """Build an index with the Stopwords,PorterStemmer pipeline (the
    reference pipeline, EFSetupTest.java:106-107); its lexicon must be
    exactly the hand-stemmed vocabulary with merged postings."""
    from collections import Counter

    from terrier_ef_spark.index.builder import build_index
    from terrier_ef_spark.tokenizer import make_tokenizer

    texts = [
        "the cats allowance for hopping relational tables",
        "a cat hopped over conditional allowances",
        "hopeful operators adjusted the adjustable conditional table",
    ]
    stop = ["the", "a", "for", "over"]
    corpus = spark.createDataFrame(
        [("r", f"f{i}", "c" * 40, "txt", t, i) for i, t in enumerate(texts)],
        "repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )
    tok = make_tokenizer("simple", stopwords=stop, stemmer="porter")
    idx = build_index(spark, corpus, str(tmp_path / "idx"), tokenizer=tok, n_partitions=2)

    # hand-stemmed oracle: tokenize -> drop stopwords -> porter per word
    want_df = Counter()
    want_cf = Counter()
    for t in texts:
        toks = [w for w in t.split() if w not in stop]
        stems = [porter_stem(w) for w in toks]
        for s in set(stems):
            want_df[s] += 1
        want_cf.update(stems)

    lex = {r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()}
    assert set(lex) == set(want_df)
    for s in want_df:
        assert lex[s] == (want_df[s], want_cf[s]), s
    # spot-check the pipeline actually stemmed (not just tokenized)
    assert "allow" in lex and "allowance" not in lex
    assert "hop" in lex and "hopping" not in lex
