"""γ-coded doc-length artifact (stored-format parity with
EFDocumentIndex.java:106-112): byte-level blob identity with the plain
γ coder, exact round-trip, and gap handling on compacted indexes."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ef_spark import ef
from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.doclens import (
    SEG_BITS,
    read_doclens_gamma,
)
from terrier_ef_spark.index.maintenance import compact_index, delete_docs


@pytest.fixture(scope="module")
def gamma_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("doclens_gamma")
    corpus = synthesize_corpus(spark, 120, seed=91, n_partitions=4)
    return build_index(spark, corpus, str(root / "idx"), block_bits=5,
                       n_partitions=4), root


def test_artifact_roundtrip_matches_docs_table(spark, gamma_idx):
    idx, _ = gamma_idx
    want = {(r["docid"], r["doclen"])
            for r in idx.docs.select("docid", "doclen").collect()}
    got = {(r["docid"], r["doclen"])
           for r in read_doclens_gamma(spark, idx.paths).collect()}
    assert got == want and len(got) == 120


def test_blob_bytes_match_plain_gamma_coder(spark, gamma_idx):
    """The stored doclens blob of each segment must be byte-identical
    to γ-coding the segment's doclens in docid order directly — the
    artifact adds segmentation, not a different code."""
    idx, _ = gamma_idx
    from terrier_ef_spark.index.doclens import doclens_gamma_path

    segs = spark.read.parquet(doclens_gamma_path(idx.paths)).collect()
    docs = sorted(
        (r["docid"], r["doclen"]) for r in idx.docs.collect()
    )
    assert segs and sum(s["n_docs"] for s in segs) == len(docs)
    for s in segs:
        lo = s["seg_id"] << SEG_BITS
        hi = (s["seg_id"] + 1) << SEG_BITS
        mine = [(d, l) for d, l in docs if lo <= d < hi]
        assert s["n_docs"] == len(mine)
        assert s["first_docid"] == mine[0][0]
        want_lens = ef.write_gamma_array([l for _, l in mine])
        assert bytes(s["doclens_gamma"]) == want_lens
        gaps = np.diff([d for d, _ in mine]) - 1
        assert bytes(s["docid_gaps_gamma"]) == ef.write_gamma_array(gaps)


def test_artifact_survives_compaction_gaps(spark, gamma_idx):
    """Compaction leaves docid holes; the gap blob must carry them."""
    idx, root = gamma_idx
    deleted = [0, 7, 8, 9, 55]
    delete_docs(idx, deleted)
    cmp_idx = compact_index(idx, str(root / "cmp"), n_partitions=4)
    got = {(r["docid"], r["doclen"])
           for r in read_doclens_gamma(spark, cmp_idx.paths).collect()}
    want = {(r["docid"], r["doclen"])
            for r in cmp_idx.docs.select("docid", "doclen").collect()}
    assert got == want
    assert not ({d for d, _ in got} & set(deleted))


def test_missing_artifact_raises(spark, tmp_path):
    from terrier_ef_spark.index.builder import IndexPaths

    with pytest.raises(FileNotFoundError, match="doclens_gamma"):
        read_doclens_gamma(spark, IndexPaths(str(tmp_path / "nope")))
