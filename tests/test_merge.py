"""Index merge: blob byte-identity, rank-identity vs a monolithic
rebuild, param guards."""

import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.merge import merge_indexes

# terms from the synthetic source-code vocabulary (corpus.doc_tokens)
QUERIES = [
    {"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
    {"qid": 2, "terms": ["class", "self", "return"], "mode": "disjunctive"},
    {"qid": 3, "terms": ["if", "else"], "mode": "conjunctive"},
]


@pytest.fixture(scope="module")
def merged_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    # two corpora over the same vocabulary family; block_bits=5 keeps
    # many blocks so the relabel path is exercised hard
    ca = synthesize_corpus(spark, 150, seed=21, n_partitions=4)
    cb = synthesize_corpus(spark, 90, seed=22, n_partitions=4)
    a = build_index(spark, ca, str(root / "a"), block_bits=5,
                    positions=True, n_partitions=4)
    b = build_index(spark, cb, str(root / "b"), block_bits=5,
                    positions=True, n_partitions=4)
    m = merge_indexes(spark, str(root / "a"), str(root / "b"),
                      str(root / "m"), n_partitions=4)
    return ca, cb, a, b, m, root


def test_merge_blob_byte_identity(spark, merged_setup):
    """Every merged blob is byte-identical to its source blob — the
    merge never re-encodes."""
    ca, cb, a, b, m, root = merged_setup
    offset = 160  # max docid 149 -> next multiple of 32
    na = a.postings.count()
    nb = b.postings.count()
    assert m.postings.count() == na + nb

    src_a = {
        (r["term"], r["block_id"]): (bytes(r["docids_ef"]), bytes(r["freqs_ef"]))
        for r in a.postings.collect()
    }
    src_b = {
        (r["term"], r["block_id"] + (offset >> 5)): (
            bytes(r["docids_ef"]), bytes(r["freqs_ef"]))
        for r in b.postings.collect()
    }
    src = {**src_a, **src_b}
    assert len(src) == na + nb  # no key collisions across sources
    for r in m.postings.collect():
        assert (bytes(r["docids_ef"]), bytes(r["freqs_ef"])) == src[
            (r["term"], r["block_id"])
        ]


def test_merge_docs_and_stats(spark, merged_setup):
    ca, cb, a, b, m, root = merged_setup
    assert m.stats["num_docs"] == 240
    assert m.stats["num_tokens"] == (
        a.stats["num_tokens"] + b.stats["num_tokens"]
    )
    # b's docids shifted by the block-aligned offset
    got = m.docs.agg(F.min("docid"), F.max("docid")).collect()[0]
    assert got[0] == 0 and got[1] == 160 + 89


def test_merge_rank_identity_vs_monolithic(spark, merged_setup, tmp_path):
    """BM25 over the merged index matches a monolithic build over the
    concatenated corpus, compared by docno (docid layouts differ by
    the alignment gap; N/avgdl and scores are identical)."""
    from terrier_ef_spark.query.engine import run_queries

    ca, cb, a, b, m, root = merged_setup
    cb_shift = cb.withColumn("doc_id", F.col("doc_id") + 150)
    mono = build_index(
        spark, ca.unionByName(cb_shift), str(tmp_path / "mono"),
        block_bits=5, positions=True, n_partitions=4,
    )

    def by_docno(idx):
        res = run_queries(idx, QUERIES, k=10)
        return sorted(
            (r["qid"], r["rank"], r["docno"], round(r["score"], 9))
            for r in res.join(
                idx.docs.select("docid", "docno"), "docid"
            ).collect()
        )

    got, want = by_docno(m), by_docno(mono)
    assert got == want and len(got) > 0


def test_merge_param_guards(spark, merged_setup, tmp_path):
    ca, cb, a, b, m, root = merged_setup
    other = build_index(
        spark, synthesize_corpus(spark, 30, seed=23, n_partitions=2),
        str(tmp_path / "qdiff"), block_bits=5, log2_quantum=3,
        positions=True, n_partitions=2,
    )
    with pytest.raises(ValueError, match="log2_quantum"):
        merge_indexes(spark, str(root / "a"), str(tmp_path / "qdiff"),
                      str(tmp_path / "out1"))
    unblocked = build_index(
        spark, synthesize_corpus(spark, 30, seed=24, n_partitions=2),
        str(tmp_path / "unblocked"), positions=True, n_partitions=2,
    )
    with pytest.raises(ValueError, match="block"):
        merge_indexes(spark, str(tmp_path / "unblocked"),
                      str(tmp_path / "unblocked"), str(tmp_path / "out2"))


def test_merge_many_three_way(spark, tmp_path):
    """N-way merge: cumulative block-aligned offsets, every blob byte
    reused, decoded postings == union of the shifted segments."""
    import json

    from terrier_ef_spark.index.merge import merge_many
    from terrier_ef_spark.query.engine import decode_postings

    segs = []
    for i, (n, seed) in enumerate(((60, 41), (45, 42), (50, 43))):
        c = synthesize_corpus(spark, n, seed=seed, n_partitions=2)
        segs.append(build_index(spark, c, str(tmp_path / f"s{i}"),
                                block_bits=5, n_partitions=2))
    m = merge_many(spark, [str(tmp_path / f"s{i}") for i in range(3)],
                   str(tmp_path / "m"), n_partitions=2)
    # max docids 59/44/49 with 32-wide blocks -> offsets 0, 64, 128
    manifest = json.load(open(str(tmp_path / "m" / "MANIFEST.json")))
    assert manifest["offsets"] == [0, 64, 128]

    src = {}
    for off, idx in zip((0, 64, 128), segs):
        for r in idx.postings.collect():
            src[(r["term"], r["block_id"] + (off >> 5))] = (
                bytes(r["docids_ef"]), bytes(r["freqs_ef"]))
    merged_rows = m.postings.collect()
    assert len(merged_rows) == len(src)  # zero collisions, zero recode
    for r in merged_rows:
        assert (bytes(r["docids_ef"]), bytes(r["freqs_ef"])) == src[
            (r["term"], r["block_id"])]

    want = set()
    for off, idx in zip((0, 64, 128), segs):
        want |= {(r["term"], r["docid"] + off, r["tf"])
                 for r in decode_postings(idx).collect()}
    got = {(r["term"], r["docid"], r["tf"])
           for r in decode_postings(m).collect()}
    assert got == want
    assert m.stats["num_docs"] == 155

    with pytest.raises(ValueError, match="at least two"):
        merge_many(spark, [str(tmp_path / "s0")], str(tmp_path / "m2"))
