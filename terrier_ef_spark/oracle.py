"""Uncompressed oracle index + trivially-auditable BM25 (FIXTURES.md F2/F4).

Plays the role of the reference tests' 'original index' — the plain
Terrier index every EF structure is differentially compared against
(IndexReadingTest.java:67-80). Pure Python loops on purpose: slow,
obviously correct, no shared code with the engine kernels."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


class OracleIndex:
    def __init__(self, docs: dict[int, list[str]]):
        """docs: docid -> token list (docids dense 0..N-1)."""
        self.num_docs = len(docs)
        self.doclen = {d: len(toks) for d, toks in docs.items()}
        self.avgdl = sum(self.doclen.values()) / max(1, self.num_docs)
        self.num_tokens = sum(self.doclen.values())
        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        for d in sorted(docs):
            counts = Counter(docs[d])
            for t in counts:
                self.postings[t].append((d, counts[t]))
            pos = defaultdict(list)
            for i, t in enumerate(docs[d]):
                pos[t].append(i)
            for t, ps in pos.items():
                self.positions[t][d] = ps

    def df(self, t):
        return len(self.postings.get(t, []))

    def cf(self, t):
        return sum(tf for _, tf in self.postings.get(t, []))

    def maxtf(self, t):
        return max((tf for _, tf in self.postings.get(t, [])), default=0)

    def idf(self, t):
        return math.log2((self.num_docs - self.df(t) + 0.5) / (self.df(t) + 0.5))

    def score(self, t, d, tf, k1=1.2, b=0.75):
        dl = self.doclen[d]
        return self.idf(t) * tf * (k1 + 1) / (
            k1 * (1 - b + b * dl / self.avgdl) + tf
        )

    def score_dph(self, t, d, tf):
        """DFR DPH (Amati, parameter-free hypergeometric)."""
        dl = self.doclen[d]
        if tf >= dl:
            return 0.0
        f = tf / dl
        norm = (1 - f) * (1 - f) / (tf + 1)
        body = tf * math.log2(
            tf * (self.avgdl / dl) * (self.num_docs / self.cf(t))
        ) + 0.5 * math.log2(2 * math.pi * tf * (1 - f))
        return norm * body

    def score_pl2(self, t, d, tf, c=1.0):
        """DFR PL2 (Poisson + Laplace + normalization 2)."""
        log2e = math.log2(math.e)
        tfn = tf * math.log2(1 + c * self.avgdl / self.doclen[d])
        lam = self.cf(t) / self.num_docs
        return (
            tfn * math.log2(1 / lam)
            + lam * log2e
            + 0.5 * math.log2(2 * math.pi * tfn)
            + tfn * (math.log2(tfn) - log2e)
        ) / (tfn + 1)

    def score_lm_dirichlet(self, t, d, tf, mu=2500.0):
        """Dirichlet-smoothed LM (Zhai & Lafferty), per-matched-term
        decomposition as in Lucene's LMDirichletSimilarity."""
        dl = self.doclen[d]
        p_c = self.cf(t) / self.num_tokens
        return math.log2(1 + tf / (mu * p_c)) + math.log2(mu / (dl + mu))

    def bm25_topk(self, terms, k=10, mode="disjunctive", model="bm25"):
        """Returns [(docid, score)] with (score desc, docid asc) order."""
        scorer = {
            "bm25": self.score,
            "dph": self.score_dph,
            "pl2": self.score_pl2,
            "lm_dirichlet": self.score_lm_dirichlet,
        }[model]
        present = [t for t in dict.fromkeys(terms) if t in self.postings]
        scores: dict[int, float] = defaultdict(float)
        hits: dict[int, int] = defaultdict(int)
        for t in present:
            for d, tf in self.postings[t]:
                scores[d] += scorer(t, d, tf)
                hits[d] += 1
        if mode == "conjunctive":
            need = len(dict.fromkeys(terms))
            if len(present) < need:
                return []
            scores = {d: s for d, s in scores.items() if hits[d] == need}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
