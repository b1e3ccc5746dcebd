"""Porter stemmer — term-pipeline stage (VERDICT r01 missing #2).

The reference's test pipeline is `Stopwords,PorterStemmer`
(EFSetupTest.java:106-107; Terrier core's org.terrier.terms.PorterStemmer
implements the original Porter 1980 algorithm). This is a from-scratch
implementation of that published algorithm ("An algorithm for suffix
stripping", M.F. Porter, Program 14(3) 1980) — steps 1a-5b with the
m-measure, *v*, *d, *o conditions.

The Spark-side stage is an Arrow-vectorized pandas UDF over token
ARRAYS with a per-batch vocabulary memo: natural text has far fewer
distinct words than tokens, so the Python stemming cost is paid once
per distinct word per batch, not once per token. (A stemmer cannot be a
Catalyst expression; this is the canonical use of the pandas-UDF escape
hatch.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    n = len(stem)
    i = 0
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) rule tables; within a step the LONGEST matching
# suffix wins (Porter: "the longest match for S1 is taken")
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(w: str, rules):
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fixup = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            fixup = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            fixup = True
        if fixup:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    r = _longest_rule(w, _STEP2)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        w = w[: len(w) - len(r[0])] + r[1]

    # step 3
    r = _longest_rule(w, _STEP3)
    if r and _measure(w[: len(w) - len(r[0])]) > 0:
        w = w[: len(w) - len(r[0])] + r[1]

    # step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or (stem and stem[-1] in "st")):
            w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


@F.pandas_udf(T.ArrayType(T.StringType()))
def porter_stem_tokens(tokens: pd.Series) -> pd.Series:
    """Stem every token in each array; per-batch vocabulary memo."""
    cache: dict[str, str] = {}

    def stem_one(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = porter_stem(t)
        return s

    return tokens.map(
        lambda xs: None if xs is None else [stem_one(x) for x in xs]
    )
