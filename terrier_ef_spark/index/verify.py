"""Index integrity verification — the Lucene CheckIndex / fsck role.

The reference ecosystem ships structural checkers (Terrier's
IndexUtil, Lucene's CheckIndex) because compressed indexes fail
SILENTLY: a corrupt EF blob decodes to garbage docids rather than
raising, and a migration/merge bug shows up as wrong rankings weeks
later. This module re-derives every invariant the build pipeline
promises and reports violations instead of trusting the artifacts:

- per-block blob invariants, checked IN-KERNEL during one decode pass
  (map-only, zero shuffle at any corpus size): decoded count == df,
  docids strictly increasing within [first_docid, last_docid] and
  under the encode bound, tf >= 1 with sum == cf and max == maxtf,
  and the BMW quantum skip grid (q_last_docid / q_max_tf) exactly
  re-derivable from the decoded sequences;
- cross-relation identities: lexicon df/cf == the per-block sums,
  termids dense 0..num_terms-1; per-doc sum(tf) == the docs table's
  doclen (one decode + one groupBy — the transpose's shuffle budget);
  the gamma-coded doclens stream byte-decodes to the same doclens;
- stats identities: num_terms/num_docs/num_postings/num_tokens/avgdl
  vs the relations they summarize; tombstones reference real docids.

Everything aggregates to bounded violation COUNTS + bounded samples —
the report is broker-sized no matter how big the index is.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from terrier_ef_spark.index.reader import EFIndex

_SAMPLE = 5  # violation examples carried per check


def _blob_check_fn(stats: dict, check_positions: bool):
    from terrier_ef_spark import ef
    from terrier_ef_spark.index.builder import block_upper_bound, decode_bound

    bb = stats.get("block_bits")
    n_docs_bound = decode_bound(stats)
    log2q = int(stats["log2_quantum"])
    q = 1 << log2q
    ub = block_upper_bound(bb, n_docs_bound)

    def check(batches):
        for pdf in batches:
            terms, blocks, errs = [], [], []
            for r in pdf.itertuples(index=False):
                df_ = int(r.df)
                base = 0 if bb is None else int(r.block_id) << bb
                problems = []
                try:
                    dec = ef.decode_docids(
                        bytes(r.docids_ef), df_, ub, log2q
                    ) + base
                    tfs = ef.decode_freqs(
                        bytes(r.freqs_ef), df_, int(r.cf), log2q
                    )
                except Exception as exc:  # truncated/foreign blob
                    problems.append(f"decode raised {type(exc).__name__}")
                    dec = tfs = None
                if dec is not None:
                    if len(dec) != df_:
                        problems.append("docid count != df")
                    if df_ and (dec[0] != r.first_docid
                                or dec[-1] != r.last_docid):
                        problems.append("first/last docid mismatch")
                    if df_ > 1 and not (np.diff(dec) > 0).all():
                        problems.append("docids not strictly increasing")
                    if df_ and dec[-1] - base >= ub:
                        problems.append("docid >= encode bound")
                    if tfs.min(initial=1) < 1:
                        problems.append("tf < 1")
                    if int(tfs.sum()) != int(r.cf):
                        problems.append("sum(tf) != cf")
                    if df_ and int(tfs.max()) != int(r.maxtf):
                        problems.append("max(tf) != maxtf")
                    # quantum skip grid re-derivation (builder lines:
                    # q_last = docids[min((i+1)Q-1, df-1)]; q_max_tf =
                    # per-quantum max over tf padded with 0)
                    n_q = max(1, math.ceil(df_ / q)) if df_ else 0
                    if n_q:
                        idx = np.minimum(np.arange(1, n_q + 1) * q - 1,
                                         df_ - 1)
                        want_last = dec[idx]
                        got_last = np.asarray(r.q_last_docid, dtype=np.int64)
                        if (len(got_last) != n_q
                                or not (want_last == got_last).all()):
                            problems.append("q_last_docid grid mismatch")
                        pad = np.zeros(n_q * q, dtype=np.int64)
                        pad[:df_] = tfs
                        want_max = pad.reshape(n_q, q).max(axis=1)
                        got_max = np.asarray(r.q_max_tf, dtype=np.int64)
                        if (len(got_max) != n_q
                                or not (want_max == got_max).all()):
                            problems.append("q_max_tf grid mismatch")
                    if check_positions and r.positions_ef is not None:
                        try:
                            plists = ef.decode_positions(
                                bytes(r.positions_ef), tfs, df_,
                                int(r.sum_max_pos), log2q,
                            )
                            if len(plists) != df_:
                                problems.append("positions list count != df")
                            elif any(
                                len(p) != t or
                                (len(p) > 1 and not (np.diff(p) > 0).all())
                                for p, t in zip(plists, tfs)
                            ):
                                problems.append(
                                    "positions count != tf or not increasing"
                                )
                        except Exception as exc:
                            problems.append(
                                f"positions decode raised {type(exc).__name__}"
                            )
                if problems:
                    terms.append(r.term)
                    blocks.append(int(r.block_id))
                    errs.append("; ".join(problems))
            yield pd.DataFrame({
                "term": pd.Series(terms, dtype=object),
                "block_id": pd.Series(blocks, dtype="int64"),
                "err": pd.Series(errs, dtype=object),
            })

    return check


def _direct_check_fn(stats: dict):
    """Per-doc forward-blob invariants, in-kernel (direct.py encodes
    termid gaps with ub=num_terms and strict tfs with ub=doclen)."""
    from terrier_ef_spark import ef

    num_terms = int(stats["num_terms"])
    log2q = int(stats["log2_quantum"])

    def check(batches):
        for pdf in batches:
            docids, errs = [], []
            for r in pdf.itertuples(index=False):
                n = int(r.count)
                problems = []
                try:
                    tids = ef.decode_docids(
                        bytes(r.termids_ef), n, num_terms, log2q
                    )
                    tfs = ef.decode_freqs(
                        bytes(r.tfs_ef), n, int(r.doclen), log2q
                    )
                except Exception as exc:
                    problems.append(f"decode raised {type(exc).__name__}")
                    tids = tfs = None
                if tids is not None:
                    if len(tids) != n:
                        problems.append("termid count != count")
                    if n > 1 and not (np.diff(tids) > 0).all():
                        problems.append("termids not strictly increasing")
                    if n and tids[-1] >= num_terms:
                        problems.append("termid >= num_terms")
                    if tfs.min(initial=1) < 1:
                        problems.append("tf < 1")
                    if int(tfs.sum()) != int(r.doclen):
                        problems.append("sum(tf) != doclen")
                if problems:
                    docids.append(int(r.docid))
                    errs.append("; ".join(problems))
            yield pd.DataFrame({
                "docid": pd.Series(docids, dtype="int64"),
                "err": pd.Series(errs, dtype=object),
            })

    return check


def verify_index(
    index: EFIndex,
    *,
    check_doclens: bool = True,
    check_positions: bool = False,
    check_gamma: bool = True,
) -> dict:
    """Run every integrity check; returns {'ok': bool, 'checks':
    {name: {'ok', 'violations', 'samples'}}}. check_positions decodes
    the full positions stream (the most expensive pass) and defaults
    off; check_doclens runs the transpose-budget per-doc tf fold."""
    stats = index.stats
    checks: dict = {}

    def record(name, bad_rows, detail=None):
        checks[name] = {
            "ok": not bad_rows,
            "violations": len(bad_rows),
            "samples": bad_rows[:_SAMPLE],
        }
        if detail is not None:
            checks[name]["detail"] = detail

    # 1. blob invariants — map-only kernel over every postings row
    cols = ["term", "block_id", "df", "cf", "maxtf", "first_docid",
            "last_docid", "docids_ef", "freqs_ef", "q_last_docid",
            "q_max_tf"]
    if check_positions and stats.get("has_positions"):
        cols += ["positions_ef", "sum_max_pos"]
    else:
        check_positions = False
    blob_bad = (
        index.postings.select(*cols)
        .mapInPandas(
            _blob_check_fn(stats, check_positions),
            schema="term string, block_id long, err string",
        )
        .limit(1000).collect()
    )
    record("blobs", [f"{r.term}/{r.block_id}: {r.err}" for r in blob_bad])

    # 2. lexicon identities: df/cf == per-block sums; dense termids
    agg = (
        index.postings.groupBy("term")
        .agg(F.sum("df").alias("sdf"), F.sum("cf").alias("scf"))
        .join(index.lexicon.select("term", "termid", "df", "cf"),
              "term", "full_outer")
        .where(
            F.col("sdf").isNull() | F.col("df").isNull()
            | (F.col("sdf") != F.col("df")) | (F.col("scf") != F.col("cf"))
        )
        .limit(1000).collect()
    )
    record("lexicon_sums", [r.term for r in agg])
    n_terms = index.lexicon.count()
    tid = index.lexicon.agg(
        F.min("termid"), F.max("termid"), F.countDistinct("termid")
    ).collect()[0]
    dense = (n_terms == int(stats["num_terms"]) and tid[0] == 0
             and tid[1] == n_terms - 1 and tid[2] == n_terms)
    record("termids_dense", [] if dense else
           [f"lexicon={n_terms} stats={stats['num_terms']} "
            f"min={tid[0]} max={tid[1]} distinct={tid[2]}"])

    # 3. per-doc sum(tf) vs doclen (one decode + one groupBy). On a
    # statically PRUNED index (index/prune.py) postings were dropped
    # by design while doclens stay full for BM25 normalization, so the
    # invariant weakens to sum(tf) <= doclen and fully-pruned docs are
    # legitimate; everywhere else it is exact equality.
    if check_doclens:
        import json as _json
        import os as _os

        from terrier_ef_spark.query.engine import decode_postings

        pruned = False
        mpath = _os.path.join(index.paths.root, "MANIFEST.json")
        if _os.path.exists(mpath):
            with open(mpath) as fh:
                man = _json.load(fh)
            pruned = man.get("op") == "prune" or bool(
                man.get("params", {}).get("pruned_from")
            )
        folded = decode_postings(index).groupBy("docid").agg(
            F.sum("tf").alias("s")
        ).join(index.docs.select("docid", "doclen"), "docid", "full_outer")
        if pruned:
            cond = (
                F.col("doclen").isNull()
                | (F.col("s").isNotNull() & (F.col("s") > F.col("doclen")))
            )
        else:
            cond = (
                F.col("doclen").isNull()  # posting doc absent from docs
                # docs with doclen 0 legitimately have no postings
                | (F.col("s").isNull() & (F.col("doclen") != 0))
                | (F.col("s").isNotNull() & (F.col("s") != F.col("doclen")))
            )
        mism = folded.where(cond).limit(1000).collect()
        record("doclen_identity",
               [f"docid {r.docid}: postings={r.s} doclen={r.doclen}"
                for r in mism],
               detail="pruned index: sum(tf) <= doclen" if pruned else None)

    # 4. gamma doclens stream == docs doclens
    import os

    from terrier_ef_spark.index.doclens import (
        doclens_gamma_path,
        read_doclens_gamma,
    )

    if check_gamma and os.path.exists(
        os.path.join(doclens_gamma_path(index.paths), "_SUCCESS")
    ):
        g = (
            read_doclens_gamma(index.spark, index.paths)
            .withColumnRenamed("doclen", "gdl")
            .join(index.docs.select("docid", "doclen"), "docid",
                  "full_outer")
            .where(F.col("gdl").isNull() | F.col("doclen").isNull()
                   | (F.col("gdl") != F.col("doclen")))
            .limit(1000).collect()
        )
        record("gamma_doclens",
               [f"docid {r.docid}: gamma={r.gdl} docs={r.doclen}" for r in g])

    # 5. stats identities (broker-sized aggregations)
    sums = index.lexicon.agg(
        F.sum("df").alias("np"), F.count("*").alias("nt")
    ).collect()[0]
    docs_agg = index.docs.agg(
        F.count("*").alias("nd"), F.sum("doclen").alias("tok")
    ).collect()[0]
    bad_stats = []
    if int(sums["np"]) != int(stats["num_postings"]):
        bad_stats.append(
            f"num_postings {stats['num_postings']} != lexicon sum {sums['np']}")
    if int(docs_agg["nd"]) != int(stats["num_docs"]):
        bad_stats.append(
            f"num_docs {stats['num_docs']} != docs count {docs_agg['nd']}")
    if int(docs_agg["tok"]) != int(stats["num_tokens"]):
        bad_stats.append(
            f"num_tokens {stats['num_tokens']} != doclen sum {docs_agg['tok']}")
    if abs(float(stats["avgdl"])
           - float(docs_agg["tok"]) / max(1, int(docs_agg["nd"]))) > 0.01:
        bad_stats.append("avgdl inconsistent")
    record("stats", bad_stats)

    # 6. direct (forward) index, when present: staleness fingerprint
    # (a direct/ built against an older inverted index mis-decodes —
    # direct.py records the source stats it derived from), per-doc
    # blob invariants in-kernel (same map-only shape as check 1), and
    # the row-count identity (every doc with doclen > 0 has exactly
    # one forward row).
    import os as _os2

    dpath = _os2.path.join(index.paths.root, "direct")
    if _os2.path.exists(_os2.path.join(dpath, "_SUCCESS")):
        import json as _json2

        from terrier_ef_spark.index.direct import _direct_meta

        meta_ok = False
        mfile = _os2.path.join(index.paths.root, "direct_meta.json")
        if _os2.path.exists(mfile):
            with open(mfile) as fh:
                meta_ok = _json2.load(fh) == _direct_meta(stats)
        record("direct_meta", [] if meta_ok else
               ["direct/ fingerprint does not match the inverted index "
                "(stale after an incremental build?) — rebuild with "
                "build_direct"])

        direct = index.spark.read.parquet(dpath)
        bad = (
            direct.select("docid", "count", "doclen", "termids_ef",
                          "tfs_ef")
            .mapInPandas(
                _direct_check_fn(stats),
                schema="docid long, err string",
            )
            .limit(1000).collect()
        )
        record("direct_blobs", [f"docid {r.docid}: {r.err}" for r in bad])
        n_direct = direct.count()
        n_nonempty = index.docs.where(F.col("doclen") > 0).count()
        record("direct_rowcount", [] if n_direct == n_nonempty else
               [f"direct rows {n_direct} != docs with doclen>0 "
                f"{n_nonempty}"])

    # 7. tombstones reference real docids
    tomb = index.deleted_docids()
    if tomb is not None:
        orphan = (
            tomb.select("docid")
            .join(index.docs.select("docid"), "docid", "left_anti")
            .limit(1000).collect()
        )
        record("tombstones", [f"docid {r.docid}" for r in orphan])

    return {"ok": all(c["ok"] for c in checks.values()), "checks": checks}
