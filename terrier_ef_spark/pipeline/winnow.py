"""Winnowing document fingerprints + clone-pair detection — the
MOSS local-fingerprinting algorithm (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) the source-code corpus mandate calls for.

MinHash/SimHash (pipeline/dedup.py) answer "are these two DOCUMENTS
near-identical?"; winnowing answers the code-clone question "do these
two documents SHARE any sufficiently long passage?" — the guarantee is
positional: every shared substring of length >= k + w - 1 contributes
at least one identical selected fingerprint to both documents, while
no fingerprint shorter than k chars ever matches. That is why MOSS,
and every plagiarism / license-contamination / vendored-copy detector
since, winnows instead of minhashing.

Algorithm (robust-winnowing simplified to the deterministic
rightmost-minimum rule):
  1. hash every k-gram (character k-gram, md5 — the cross-engine
     contract hash, lexicographic order on the hex digest);
  2. slide a window of w consecutive k-gram hashes; in each window
     select the minimum hash, breaking ties by the RIGHTMOST position
     (MOSS's tie rule; adjacent windows then re-select the same gram,
     so expected density is 2/(w+1));
  3. the distinct selected (position, hash) pairs are the document's
     fingerprints.

Scale shape (the load-bearing design choice): fingerprinting is ONE
Arrow-batched mapInPandas pass — every k-gram of a document comes from
that document's single input row, so hashing AND window-minimum
selection happen inside the executor with NumPy sliding windows,
map-only, ZERO shuffle at any corpus size (plan-asserted in tests).
The tempting pure-Catalyst formulation (explode positions, then
min() over a Window.partitionBy(doc_id)) hash-EXCHANGES the exploded
gram relation — |content| rows per document across the wire — which
at 100 TB is a shuffle of the corpus times ~1; the DuckDB oracle twin
deliberately USES that window formulation, so the correctness gate
compares two independent algorithm expressions.

Clone pairs then follow the repo's LSH discipline (dedup.py): bucket
by fingerprint value, CAP bucket size before the self-join (a
boilerplate header shared by M docs would otherwise emit M^2 pairs),
keep the skipped buckets enumerable in a ledger — no silent
truncation, no unbounded self-join.

Reference parity note: terrier-ef has no clone detection (it is an
index-layout library); this module belongs to the training-data
pipeline mandate, next to MinHash-LSH and SimHash in dedup.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from terrier_ef_spark.util import eager_release

__all__ = [
    "winnow_fingerprints",
    "winnow_sql_duckdb",
    "winnow_clone_pairs",
    "winnow_skipped_fps",
    "CLONE_MAX_BUCKET",
]

# Position complement base for the (min hash, RIGHTMOST position)
# selection key: min(hex || '#' || zfill(BIG - pos)) is lexicographic
# (hash asc, pos desc). Valid for any document under 10^9 characters.
_BIG = 1_000_000_000

# Default clone-bucket cap: a fingerprint shared by more docs than
# this is ubiquitous boilerplate (license headers, generated
# preambles) — pair evidence from it is noise AND quadratic.
CLONE_MAX_BUCKET = 200


# polynomial base for the fast hash mode: odd multiplier with good
# avalanche over 2^64 (the splitmix64 increment constant)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)


def _select(hs: np.ndarray, n: int, w: int):
    """Rightmost-minimum window selection over a per-gram hash array
    (any dtype with vectorized comparisons): returns the selected
    (1-based pos, hash) arrays, one entry PER WINDOW — adjacent
    windows re-select the same gram, so the caller dedups (per
    Arrow batch, one C-speed drop_duplicates — a per-element Python
    loop here dominated the kernel, not the hashing). Shift-reduce on
    the (hash, position) pair, w-1 vectorized passes."""
    base = np.arange(n - w + 1, dtype=np.int64)  # window starts
    winh = hs[: n - w + 1].copy()
    winp = base.copy()
    for j in range(1, w):
        ch = hs[j : n - w + 1 + j]
        cp = base + j  # candidate absolute position at offset j
        take = (ch < winh) | ((ch == winh) & (cp > winp))
        winh = np.where(take, ch, winh)
        winp = np.where(take, cp, winp)
    return winp + 1, winh


def _winnow_arrays_md5(text: str, k: int, w: int):
    """md5-mode kernel: per-gram hashlib calls (the cross-engine
    contract hash), array-native selection. None if no full window
    fits (a document with fewer than w k-grams selects nothing — no
    shared passage of guarantee length k + w - 1 fits in it)."""
    n = len(text) - k + 1
    if n < w:
        return None
    hs = np.array(
        [
            hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()
            for i in range(n)
        ],
        dtype="<U32",
    )
    return _select(hs, n, w)


def _winnow_arrays_poly(text: str, k: int, w: int):
    """Fast-mode kernel: 64-bit polynomial k-gram hashes over
    CHARACTER code points (same gram positions as the md5 mode),
    fully vectorized — h = h*B + c folded k times over shifted
    codepoint arrays, uint64 wraparound as the modulus; hex rendering
    via one hexlify over the big-endian byte buffer. The winnowing
    guarantee holds for ANY gram hash, but DuckDB cannot reproduce
    this one, so md5 stays the oracle-verifiable default and this is
    the production fast path (document which mode an artifact was
    built with — the two modes' fingerprints never match each
    other)."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = codes.size - k + 1
    if n < w:
        return None
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _POLY_B + codes[j : j + n].astype(np.uint64)
    # selection and dedup run on the raw uint64 hashes; hex rendering
    # happens ONCE per batch over the (much smaller) deduped winners
    # — rendering every gram first cost ~5 memory passes over arrays
    # the selection was about to throw away
    return _select(h, n, w)


def _hex16(vals: np.ndarray) -> np.ndarray:
    import binascii

    return np.frombuffer(
        binascii.hexlify(np.ascontiguousarray(vals, dtype=">u8").tobytes()),
        dtype="S16",
    ).astype("U16")


def _winnow_one(text: str, k: int, w: int) -> list[tuple[int, str]]:
    """Distinct (pos, md5-hex) list over the md5 kernel (tests and
    small callers)."""
    sel = _winnow_arrays_md5(text, k, w)
    return [] if sel is None else sorted({(int(p), str(f))
                                          for p, f in zip(*sel)})


def _winnow_one_poly(text: str, k: int, w: int) -> list[tuple[int, str]]:
    """Distinct (pos, 16-hex) list over the poly kernel."""
    sel = _winnow_arrays_poly(text, k, w)
    if sel is None:
        return []
    p, f = sel
    return sorted({(int(a), str(b)) for a, b in zip(p, _hex16(f))})


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, pos, fp) winnowing fingerprints of every document:
    fp = hash of the k-gram at 1-based character position pos,
    selected by the w-window rightmost-minimum rule. Map-only
    (mapInPandas), zero shuffle at any corpus size.

    hash_fn='md5' (default): cross-engine contract hash — the DuckDB
    twin reproduces it, so gate/oracle comparisons work; per-gram
    hashlib calls are the cost. hash_fn='poly': fully vectorized
    64-bit polynomial hash (measured ~10x faster) for production
    fingerprinting at scale; not SQL-reproducible, and its
    fingerprints never match md5-mode artifacts — don't mix modes
    across a clone-pair join."""
    if k < 2 or w < 1:
        raise ValueError(f"need k >= 2 and w >= 1, got k={k} w={w}")
    if hash_fn not in ("md5", "poly"):
        raise ValueError(f"hash_fn must be 'md5' or 'poly', got {hash_fn!r}")
    kernel = _winnow_arrays_md5 if hash_fn == "md5" else _winnow_arrays_poly

    src = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(text_col).alias("_t"))
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "pos": pd.Series([], dtype="int64"),
        "fp": pd.Series([], dtype="object"),
    })

    def gen(batches):
        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, txt in zip(pdf["doc_id"].values, pdf["_t"].values):
                if txt is None:
                    continue
                sel = kernel(str(txt), k, w)
                if sel is None:
                    continue
                p, f = sel
                ids.append(np.full(p.size, did, dtype=np.int64))
                poss.append(p)
                fps.append(f)
            if not ids:
                yield empty
                continue
            # one frame + one C-speed dedup per Arrow batch (windows
            # re-select shared grams; duplicates are within-doc only);
            # poly-mode hashes stay uint64 through the dedup and
            # render to hex once over the deduped winners
            df = pd.DataFrame({
                "doc_id": np.concatenate(ids),
                "pos": np.concatenate(poss),
                "fp": np.concatenate(fps),
            }).drop_duplicates(ignore_index=True)
            if df["fp"].dtype == np.uint64:
                df["fp"] = _hex16(df["fp"].to_numpy())
            yield df

    return src.mapInPandas(gen, "doc_id long, pos long, fp string")


def winnow_sql_duckdb(src_sql: str, k: int = 8, w: int = 4,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB twin of winnow_fingerprints over `src_sql` (a relation
    with id/text columns) — deliberately the OTHER formulation:
    explode gram positions, window-minimum of the same selection key,
    distinct survivors. Two independent expressions of the algorithm
    agreeing is the gate's verification."""
    return f"""
WITH wsrc AS (SELECT {id_col} AS doc_id, {text_col} AS wtext
              FROM {src_sql}),
wg AS (SELECT doc_id, wtext, length(wtext) - {k} + 1 AS n FROM wsrc
       WHERE length(wtext) - {k} + 1 >= {w}),
we AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS pos, wtext
       FROM wg),
wh AS (SELECT doc_id, n, pos,
              md5(substring(wtext, pos, {k})) || '#' ||
              lpad(({_BIG} - pos)::VARCHAR, 10, '0') AS wkey
       FROM we),
wm AS (SELECT doc_id, n, pos,
              min(wkey) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS wsel
       FROM wh)
SELECT DISTINCT doc_id,
       {_BIG} - substring(wsel, 34, 10)::BIGINT AS pos,
       substring(wsel, 1, 32) AS fp
FROM wm WHERE pos <= n - {w} + 1
"""


def winnow_clone_pairs(
    fps: DataFrame,
    min_shared: int = 5,
    max_bucket: int | None = CLONE_MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) clone-candidate pairs: documents
    sharing >= min_shared distinct winnowing fingerprint VALUES
    (doc_a < doc_b). Fingerprints present in more than `max_bucket`
    documents are excluded BEFORE the self-join (the dedup.py LSH cap
    discipline — boilerplate shared M ways would emit M^2 pairs);
    excluded values stay enumerable via winnow_skipped_fps. The cap
    window and the join share the fp hash partitioning, so the cap
    costs no extra shuffle."""
    if min_shared < 1:
        raise ValueError(f"need min_shared >= 1, got {min_shared}")
    dv = fps.select("doc_id", "fp").distinct()
    if max_bucket is not None:
        bw = Window.partitionBy("fp")
        dv = (
            dv.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    dv = dv.persist()  # the self-join would recompute the UDF per side
    a, b = dv.alias("a"), dv.alias("b")
    pairs = (
        a.join(b, "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return eager_release(pairs, dv)


def winnow_skipped_fps(
    fps: DataFrame, max_bucket: int = CLONE_MAX_BUCKET
) -> DataFrame:
    """(fp, n_docs) for every fingerprint value the clone-pair cap
    excluded — the explicit no-silent-truncation ledger."""
    return (
        fps.select("doc_id", "fp")
        .distinct()
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > max_bucket)
    )
