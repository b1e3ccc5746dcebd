"""Index integrity verification (index/verify.py): the CheckIndex /
fsck role — in-kernel blob invariants plus cross-relation and stats
identities."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pytest

from terrier_ef_spark.index.verify import _blob_check_fn, verify_index


def test_clean_index_verifies(small_index):
    rep = verify_index(small_index, check_positions=True)
    assert rep["ok"], rep
    for name in ("blobs", "lexicon_sums", "termids_dense",
                 "doclen_identity", "stats"):
        assert name in rep["checks"], name
        assert rep["checks"][name]["violations"] == 0, rep["checks"][name]


def test_tombstoned_index_verifies(small_index):
    from terrier_ef_spark.index.maintenance import clear_deletes, delete_docs

    try:
        delete_docs(small_index, [0])
        rep = verify_index(small_index, check_doclens=False)
        assert rep["ok"], rep
        assert rep["checks"]["tombstones"]["violations"] == 0
    finally:
        clear_deletes(small_index)


def _kernel_errs(stats, pdf):
    out = list(_blob_check_fn(stats, False)([pdf]))
    return pd.concat(out)["err"].tolist()


def test_blob_kernel_flags_corruption(small_index):
    row = (small_index.postings.where("df > 4")
           .orderBy("term").limit(1).toPandas())
    stats = small_index.stats
    assert _kernel_errs(stats, row) == []  # pristine row passes

    bad = row.copy()
    bad["maxtf"] = bad["maxtf"] + 1
    assert any("maxtf" in e for e in _kernel_errs(stats, bad))

    bad = row.copy()
    bad["cf"] = bad["cf"] + 1
    errs = _kernel_errs(stats, bad)
    assert errs  # wrong cf breaks the freq decode bound or the sum

    bad = row.copy()
    # zero the payload: decode yields garbage (all-equal docids), which
    # the monotonicity / first-last checks must flag
    bad["docids_ef"] = [bytes(len(bytes(row["docids_ef"].iloc[0])))]
    assert _kernel_errs(stats, bad)

    bad = row.copy()
    grid = list(row["q_max_tf"].iloc[0])
    grid[0] += 1
    bad["q_max_tf"] = [grid]
    assert any("q_max_tf" in e for e in _kernel_errs(stats, bad))


def test_direct_index_checks(spark, small_index, tmp_path):
    """With a forward index present, the fsck verifies its fingerprint,
    per-doc blobs, and row count; a stale fingerprint and a corrupt
    blob are both flagged."""
    from terrier_ef_spark.index.direct import build_direct
    from terrier_ef_spark.index.reader import open_index
    from terrier_ef_spark.index.verify import _direct_check_fn

    build_direct(small_index, n_partitions=2)
    rep = verify_index(small_index, check_doclens=False)
    for name in ("direct_meta", "direct_blobs", "direct_rowcount"):
        assert rep["checks"][name]["ok"], rep["checks"][name]

    # corrupt forward blob flagged by the kernel
    row = (spark.read.parquet(small_index.paths.root + "/direct")
           .where("count > 2").limit(1).toPandas())
    clean = pd.concat(list(
        _direct_check_fn(small_index.stats)([row])
    ))["err"].tolist()
    assert clean == []
    bad = row.copy()
    bad["tfs_ef"] = [bytes(len(bytes(row["tfs_ef"].iloc[0])))]
    errs = pd.concat(list(
        _direct_check_fn(small_index.stats)([bad])
    ))["err"].tolist()
    assert errs

    # stale fingerprint flagged on a tampered clone
    clone = str(tmp_path / "stale")
    shutil.copytree(small_index.paths.root, clone)
    mp = os.path.join(clone, "direct_meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["num_postings"] += 1
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    rep = verify_index(open_index(spark, clone), check_doclens=False,
                       check_gamma=False)
    assert not rep["checks"]["direct_meta"]["ok"]


def test_pruned_index_weak_doclen_invariant(spark, small_index, tmp_path):
    """A tf-top-N pruned index drops postings by design while doclens
    stay full for BM25 normalization — the fsck must apply
    sum(tf) <= doclen there, not equality."""
    from terrier_ef_spark.index.prune import prune_index
    from terrier_ef_spark.index.reader import open_index

    # small_index is positional; prune refuses positions, so build a
    # non-positional sibling from the same corpus quickly
    from terrier_ef_spark.corpus import synthesize_corpus
    from terrier_ef_spark.index.builder import build_index

    c = synthesize_corpus(spark, 60, seed=7, n_partitions=2)
    base = build_index(spark, c, str(tmp_path / "b"), block_bits=5,
                       n_partitions=2)
    pruned = prune_index(base, str(tmp_path / "p"), top_n=3)
    rep = verify_index(open_index(spark, pruned.paths.root))
    assert rep["ok"], rep
    assert rep["checks"]["doclen_identity"]["detail"].startswith("pruned")


def test_stats_tamper_detected(spark, small_index, tmp_path):
    from terrier_ef_spark.index.reader import open_index

    clone = str(tmp_path / "tampered")
    shutil.copytree(small_index.paths.root, clone)
    sp = os.path.join(clone, "stats.json")
    with open(sp) as fh:
        stats = json.load(fh)
    stats["num_tokens"] += 1
    with open(sp, "w") as fh:
        json.dump(stats, fh)
    rep = verify_index(open_index(spark, clone), check_doclens=False,
                       check_gamma=False)
    assert not rep["ok"]
    assert not rep["checks"]["stats"]["ok"]
    assert any("num_tokens" in s for s in rep["checks"]["stats"]["samples"])
