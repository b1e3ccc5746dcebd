"""BM25 scoring kernels — pure NumPy, whole-array (no per-posting Python).

Query matching is NOT in the reference repo (it lives in Terrier core;
pom.xml:61-71 declares the dependency) but is required by the north
star. Semantics follow Terrier 5's published BM25 weighting model:

    idf  = log2((N - df + 0.5) / (df + 0.5))          (Robertson idf)
    tfn  = tf * (k1 + 1) / (k1 * (1 - b + b * dl/avgdl) + tf)
    score(d) = sum over query terms of idf * tfn
    k1 = 1.2, b = 0.75; query-term weight = 1 for single-occurrence terms

Tie-break: (score desc, docid asc), fixed so ranking is deterministic
across partitions (SURVEY.md §7 risk 2).

Four algorithms, all rank-identical (tested):
- disjunctive exhaustive (bincount over the union),
- conjunctive (sorted-list intersection via np.searchsorted — the
  vectorized equivalent of the reference's next(target) galloping,
  EFBasicIterablePosting.java:163-178),
- block-max WAND, vectorized as safe block-max filtering over the
  2^log2Quantum posting blocks (Ding & Suel SIGIR'11): a provisional
  exact threshold from the rarest term's candidates, per-block upper
  bounds prune docs whose bound is strictly below it,
- MaxScore (Turtle & Flood, IP&M 1995), vectorized as an
  essential/non-essential list split on TERM-level upper bounds: the
  candidate union shrinks to the essential lists only.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1 = 1.2
B = 0.75


def idf(num_docs: int, df: int) -> float:
    return float(np.log2((num_docs - df + 0.5) / (df + 0.5)))


def tfn(
    tfs: np.ndarray, doclens: np.ndarray, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    return tfs * (k1 + 1) / (k1 * (1 - b + b * doclens / avgdl) + tfs)


@dataclass
class TermPostings:
    """One query term's decoded postings + metadata for scoring."""

    term: str
    idf: float
    docids: np.ndarray          # int64, ascending
    tfs: np.ndarray             # int64
    q_last_docid: np.ndarray | None = None   # block boundaries (BMW)
    q_max_tf: np.ndarray | None = None       # block max tf (BMW)
    q_min_dl: np.ndarray | None = None       # block min doclen (BMW)

    def contribs(
        self, doclen_arr: np.ndarray, avgdl: float,
        k1: float = K1, b: float = B,
    ) -> np.ndarray:
        return self.idf * tfn(
            self.tfs, doclen_arr[self.docids].astype(np.float64), avgdl,
            k1, b,
        )


def _topk(docids: np.ndarray, scores: np.ndarray, k: int):
    """(score desc, docid asc) top-k, deterministic."""
    if len(docids) == 0:
        return docids[:0], scores[:0]
    order = np.lexsort((docids, -scores))[:k]
    return docids[order], scores[order]


def topk_disjunctive(
    terms: list[TermPostings], doclen_arr: np.ndarray, avgdl: float, k: int,
    *, k1: float = K1, b: float = B,
):
    """Exhaustive union scoring: concat (docid, contrib) from each term,
    aggregate with unique+bincount (the vectorized equivalent of the
    per-partition score accumulation in SURVEY.md §2.3)."""
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    all_d = np.concatenate([t.docids for t in terms])
    all_c = np.concatenate([t.contribs(doclen_arr, avgdl, k1, b) for t in terms])
    uniq, inv = np.unique(all_d, return_inverse=True)
    scores = np.bincount(inv, weights=all_c)
    return _topk(uniq, scores, k)


def topk_conjunctive(
    terms: list[TermPostings], doclen_arr: np.ndarray, avgdl: float, k: int,
    *, k1: float = K1, b: float = B,
):
    """Intersection scoring, smallest-df list first (mirrors the
    skipping cascade Q2 in SURVEY.md §2.2)."""
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    order = np.argsort([len(t.docids) for t in terms])
    cand = terms[int(order[0])].docids
    for i in order[1:]:
        d = terms[int(i)].docids
        if len(d) == 0 or len(cand) == 0:
            return cand[:0], np.zeros(0)
        pos = np.minimum(np.searchsorted(d, cand), len(d) - 1)
        cand = cand[d[pos] == cand]
    if len(cand) == 0:
        return cand, np.zeros(0)
    scores = np.zeros(len(cand))
    for t in terms:
        pos = np.searchsorted(t.docids, cand)
        scores += t.contribs(doclen_arr, avgdl, k1, b)[pos]
    return _topk(cand, scores, k)


def topk_bmw(
    terms: list[TermPostings], doclen_arr: np.ndarray, avgdl: float, k: int,
    stats_out: dict | None = None, *, k1: float = K1, b: float = B,
):
    """Safe-to-k block-max pruned disjunctive top-k; rank-identical to
    topk_disjunctive by construction (prunes only docs whose per-block
    upper bound is strictly below a provably-valid threshold).

    `stats_out`, if given, receives {'candidates', 'survivors'} — the
    pruning-effectiveness diagnostics."""
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    live = [t for t in terms if len(t.docids)]
    if not live:
        return np.zeros(0, dtype=np.int64), np.zeros(0)

    contribs = {t.term: t.contribs(doclen_arr, avgdl, k1, b) for t in live}

    def exact_scores(cand: np.ndarray) -> np.ndarray:
        s = np.zeros(len(cand))
        for t in live:
            pos = np.searchsorted(t.docids, cand)
            pos_c = np.minimum(pos, len(t.docids) - 1)
            hit = t.docids[pos_c] == cand
            s += np.where(hit, contribs[t.term][pos_c], 0.0)
        return s

    # 1. provisional threshold: exact-score a seed candidate set built
    # from the rarest (highest-idf) terms' lists until it holds >= k
    # docs — a short seed list (df < k) alone would leave theta at -inf
    # and disable pruning entirely
    seed_docs: list[np.ndarray] = []
    total = 0
    for t in sorted(live, key=lambda t: -t.idf):
        seed_docs.append(t.docids)
        total += len(t.docids)
        if total >= k:
            break
    seed_union = np.unique(np.concatenate(seed_docs))
    seed_scores = exact_scores(seed_union)
    if len(seed_scores) >= k:
        theta = np.partition(seed_scores, -k)[-k]
    else:
        theta = -np.inf

    # 2. per-doc upper bound = sum over terms of the containing block's
    #    max contribution; prune strictly below theta
    all_d = np.concatenate([t.docids for t in live])
    ubs = []
    for t in live:
        if t.q_last_docid is None or t.q_max_tf is None:
            ub_t = np.full(len(t.docids), max(t.idf, 0.0) * (k1 + 1))
        else:
            # per-block max tf-norm bound from stored (max tf, min dl):
            # tfn is increasing in tf and decreasing in dl, so this
            # dominates every member's tfn for the query-time avgdl
            blk = np.searchsorted(t.q_last_docid, t.docids, side="left")
            max_tfn = tfn(
                np.asarray(t.q_max_tf, dtype=np.float64),
                np.asarray(t.q_min_dl, dtype=np.float64),
                avgdl, k1, b,
            )
            block_ub = t.idf * max_tfn
            ub_t = np.maximum(block_ub, 0.0)[blk] if t.idf < 0 else block_ub[blk]
        ubs.append(ub_t)
    all_ub = np.concatenate(ubs)
    uniq, inv = np.unique(all_d, return_inverse=True)
    doc_ub = np.bincount(inv, weights=all_ub)
    survivors = uniq[doc_ub >= theta] if np.isfinite(theta) else uniq
    if stats_out is not None:
        stats_out["candidates"] = int(len(uniq))
        stats_out["survivors"] = int(len(survivors))

    # 3. exact-score survivors only
    scores = exact_scores(survivors)
    return _topk(survivors, scores, k)


def topk_maxscore(
    terms: list[TermPostings], doclen_arr: np.ndarray, avgdl: float, k: int,
    stats_out: dict | None = None, *, k1: float = K1, b: float = B,
):
    """Safe-to-k MaxScore pruned disjunctive top-k (Turtle & Flood,
    IP&M 1995 — the other classic dynamic-pruning algorithm beside
    WAND; terrier-micro ships both). Rank-identical to
    topk_disjunctive by construction.

    Vectorized shape: terms are split by TERM-level max contribution
    into non-essential (the maximal ascending-UB prefix whose UB sum
    stays strictly below a provably-valid threshold theta) and
    essential lists. Any doc absent from every essential list scores
    <= sum(non-essential UBs) < theta <= the true k-th score, so the
    candidate set is the union of the essential lists only; candidates
    are exact-scored across ALL lists (the searchsorted lookups into
    non-essential lists are the vectorized equivalent of MaxScore's
    skipTo probes).

    `stats_out`, if given, receives {'candidates', 'survivors',
    'n_essential'}: full-union size, scored-candidate count, and the
    essential-list count."""
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    live = [t for t in terms if len(t.docids)]
    if not live:
        return np.zeros(0, dtype=np.int64), np.zeros(0)

    contribs = {t.term: t.contribs(doclen_arr, avgdl, k1, b) for t in live}

    def exact_scores(cand: np.ndarray) -> np.ndarray:
        s = np.zeros(len(cand))
        for t in live:
            pos = np.searchsorted(t.docids, cand)
            pos_c = np.minimum(pos, len(t.docids) - 1)
            hit = t.docids[pos_c] == cand
            s += np.where(hit, contribs[t.term][pos_c], 0.0)
        return s

    # 1. provisional threshold, same seed discipline as topk_bmw:
    # exact-score rarest terms' lists until the seed holds >= k docs
    seed_docs: list[np.ndarray] = []
    total = 0
    for t in sorted(live, key=lambda t: -t.idf):
        seed_docs.append(t.docids)
        total += len(t.docids)
        if total >= k:
            break
    seed_union = np.unique(np.concatenate(seed_docs))
    seed_scores = exact_scores(seed_union)
    theta = (
        np.partition(seed_scores, -k)[-k] if len(seed_scores) >= k else -np.inf
    )

    # 2. term-level upper bounds, clamped at 0 (a doc NOT containing a
    # negative-idf term contributes 0 from it, so 0 is the valid bound
    # for docs outside the list — mirroring topk_bmw's clamp)
    ubs = []
    for t in live:
        if t.q_last_docid is None or t.q_max_tf is None:
            ub = max(t.idf, 0.0) * (k1 + 1)
        else:
            max_tfn = tfn(
                np.asarray(t.q_max_tf, dtype=np.float64),
                np.asarray(t.q_min_dl, dtype=np.float64),
                avgdl, k1, b,
            )
            ub = float(np.max(np.maximum(t.idf * max_tfn, 0.0)))
        ubs.append(max(ub, 0.0))

    # 3. the maximal ascending-UB prefix with cumulative UB strictly
    # below theta is non-essential; everything else is essential
    order = np.argsort(ubs, kind="stable")
    cum = 0.0
    essential = set(range(len(live)))
    for i in order:
        if cum + ubs[int(i)] < theta:
            cum += ubs[int(i)]
            essential.discard(int(i))
        else:
            break

    cand_lists = [live[i].docids for i in sorted(essential)]
    cand = np.unique(np.concatenate(cand_lists + [seed_union]))
    if stats_out is not None:
        stats_out["candidates"] = int(
            len(np.unique(np.concatenate([t.docids for t in live])))
        )
        stats_out["survivors"] = int(len(cand))
        stats_out["n_essential"] = len(essential)

    scores = exact_scores(cand)
    return _topk(cand, scores, k)


ALGOS = {
    "naive": topk_disjunctive,
    "bmw": topk_bmw,
    "maxscore": topk_maxscore,
}
