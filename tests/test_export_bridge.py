"""Terrier-layout export/import bridge: byte-level differential of the
exported global bitstreams against the slow reference coder laid out
with global offsets (EliasFanoWriters.java:32-48), the byte-append +
offset-rebase merge (CompressorReducer.java:101-109), and full
round-trip back to posting rows."""

from __future__ import annotations

import json

import numpy as np
import pytest

from terrier_ef_spark.corpus import synthesize_corpus
from terrier_ef_spark.index.builder import build_index
from terrier_ef_spark.index.export import (
    export_merge_bitfiles,
    export_terrier_bitfiles,
    import_terrier_bitfiles,
    read_term_from_bitfiles,
)
from terrier_ef_spark.query.engine import decode_postings
from tests.slow_ef_reference import slow_encode_bits

LOG2Q = 3  # small quantum -> many skip pointers inside the streams


@pytest.fixture(scope="module")
def export_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    corpus = synthesize_corpus(spark, 60, seed=81, n_partitions=4)
    idx = build_index(spark, corpus, str(root / "idx"),
                      log2_quantum=LOG2Q, block_bits=5, n_partitions=4)
    prefix = str(root / "ef")
    props = export_terrier_bitfiles(idx, prefix)
    rows = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in decode_postings(idx).collect()
    )
    return idx, prefix, props, rows, root


def _slow_streams(rows, num_docs):
    """Lay out the slow coder's per-term raw bits back-to-back with
    global bit offsets — independently reproducing the export layout."""
    by_term: dict[str, list] = {}
    for term, docid, tf in rows:
        by_term.setdefault(term, []).append((docid, tf))
    d_bits: list[int] = []
    f_bits: list[int] = []
    offsets = {}
    for term in sorted(by_term):
        plist = sorted(by_term[term])
        docids = [d for d, _ in plist]
        tfs = [t for _, t in plist]
        gaps = np.diff(np.asarray(docids, dtype=np.int64), prepend=np.int64(0))
        offsets[term] = (len(d_bits), len(f_bits))
        d_bits += slow_encode_bits(gaps.tolist(), num_docs, False, True, LOG2Q)
        f_bits += slow_encode_bits(tfs, sum(tfs), True, False, LOG2Q)
    return d_bits, f_bits, offsets


def _pack(bits: list[int]) -> bytes:
    nbytes = (len(bits) + 7) // 8
    nbytes += (-nbytes) % 8
    out = bytearray(nbytes)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def test_streams_byte_match_slow_reference_layout(export_setup):
    idx, prefix, props, rows, _ = export_setup
    d_bits, f_bits, offsets = _slow_streams(rows, props["num_docs"])
    with open(prefix + ".docids", "rb") as fh:
        assert fh.read() == _pack(d_bits)
    with open(prefix + ".freqs", "rb") as fh:
        assert fh.read() == _pack(f_bits)
    assert props["docids_bits"] == len(d_bits)
    assert props["freqs_bits"] == len(f_bits)
    # lexicon bit offsets == the slow layout's cumulative offsets
    from terrier_ef_spark.index.export import _read_lexicon

    lex = _read_lexicon(prefix)
    assert len(lex["term"]) == len(offsets)
    for i, term in enumerate(lex["term"]):
        assert (
            lex["docid_bit_offset"][i], lex["freq_bit_offset"][i]
        ) == offsets[term], term


def test_import_roundtrip(spark, export_setup):
    _, prefix, _, rows, _ = export_setup
    got = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in import_terrier_bitfiles(spark, prefix).collect()
    )
    assert got == rows


def test_random_access_by_offset(export_setup):
    """Per-term random access via lexicon offsets (the EFLexiconEntry
    read path) for first/middle/last terms of the stream."""
    _, prefix, _, rows, _ = export_setup
    by_term: dict[str, list] = {}
    for term, docid, tf in rows:
        by_term.setdefault(term, []).append((docid, tf))
    terms = sorted(by_term)
    for term in (terms[0], terms[len(terms) // 2], terms[-1]):
        docids, tfs = read_term_from_bitfiles(prefix, term)
        assert list(zip(docids.tolist(), tfs.tolist())) == sorted(by_term[term])
    with pytest.raises(KeyError):
        read_term_from_bitfiles(prefix, "zzz_not_a_term")


def test_partitioned_export_merges_to_same_postings(spark, export_setup):
    """Two term-partition exports + the byte-append/offset-rebase merge
    must serve exactly the same postings as the single full export —
    the CompressorReducer.java:101-109 math, validated end-to-end."""
    idx, _, _, rows, root = export_setup
    terms = sorted({t for t, _, _ in rows})
    cut = len(terms) // 2
    pa_, pb = str(root / "part_a"), str(root / "part_b")
    export_terrier_bitfiles(idx, pa_, terms=terms[:cut])
    export_terrier_bitfiles(idx, pb, terms=terms[cut:])
    out = str(root / "merged")
    props = export_merge_bitfiles(pa_, pb, out)
    assert props["num_terms"] == len(terms)
    got = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in import_terrier_bitfiles(spark, out).collect()
    )
    assert got == rows
    # b-side random access goes through the rebased offsets — and the
    # rebase must be 8 * byte-size of the a-side files, nothing else
    with open(pa_ + ".docids", "rb") as fh:
        a_len = len(fh.read())
    from terrier_ef_spark.index.export import _read_lexicon

    la, lm = _read_lexicon(pa_), _read_lexicon(out)
    b0 = lm["term"].index(terms[cut])
    lb = _read_lexicon(pb)
    assert lm["docid_bit_offset"][b0] == lb["docid_bit_offset"][0] + 8 * a_len
    probe = terms[-1]
    docids, tfs = read_term_from_bitfiles(out, probe)
    want = sorted((d, t) for tm, d, t in rows if tm == probe)
    assert list(zip(docids.tolist(), tfs.tolist())) == want


def test_merge_guards(export_setup):
    _, prefix, _, rows, root = export_setup
    # overlapping term ranges must refuse (offsets would be wrong)
    with pytest.raises(ValueError, match="term-partitioned"):
        export_merge_bitfiles(prefix, prefix, str(root / "bad"))


@pytest.fixture(scope="module")
def pos_export_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pos_export")
    corpus = synthesize_corpus(spark, 40, seed=82, n_partitions=2)
    idx = build_index(spark, corpus, str(root / "idx"),
                      log2_quantum=LOG2Q, block_bits=5, positions=True,
                      n_partitions=2)
    prefix = str(root / "ef")
    props = export_terrier_bitfiles(idx, prefix)
    return idx, prefix, props, root


def _test_gamma_bits(value):
    """Independent gamma writer for the differential (LSB-first,
    writeGamma(v) == nonZeroGamma(v+1))."""
    v = value + 1
    b = v.bit_length() - 1
    bits = [0] * b + [1]
    for kk in range(b):
        bits.append((v ^ (1 << b)) >> kk & 1)
    return bits


def test_positions_stream_byte_match_slow_layout(spark, pos_export_setup):
    """The .positions stream: per term a gamma(lowerBits) header,
    nonZeroGamma(pointerSize) when pointered, then the strict EF
    payload — laid out back-to-back (EliasFanoBlockEncoders.java:75-89),
    byte-compared against the slow coder + an independent gamma writer."""
    from terrier_ef_spark import ef
    from terrier_ef_spark.query.engine import decode_positions_df

    idx, prefix, props, _ = pos_export_setup
    assert props["positions"]
    pdf = decode_positions_df(idx).toPandas().sort_values(
        ["term", "docid", "pos"])
    all_bits = []
    offsets = {}
    for term, g in pdf.groupby("term", sort=True):
        plists = [gg["pos"].to_list()
                  for _, gg in g.groupby("docid", sort=True)]
        df_t = len(plists)
        cf = sum(len(p) for p in plists)
        smp = sum(p[-1] for p in plists)
        ub = df_t + smp
        vals = []
        for p in plists:
            vals.append(1 + p[0])
            vals.extend(b - a for a, b in zip(p, p[1:]))
        offsets[term] = len(all_bits)
        all_bits += _test_gamma_bits(ef.lower_bits(cf, ub, True))
        if ef.number_of_pointers(cf, ub, LOG2Q, True, False) > 0:
            all_bits += _test_gamma_bits(
                ef.pointer_size(cf, ub, True, False) - 1)
        all_bits += slow_encode_bits(vals, ub, True, False, LOG2Q)
    with open(prefix + ".positions", "rb") as fh:
        assert fh.read() == _pack(all_bits)
    assert props["positions_bits"] == len(all_bits)
    from terrier_ef_spark.index.export import _read_lexicon

    lex = _read_lexicon(prefix)
    for i, term in enumerate(lex["term"]):
        assert lex["pos_bit_offset"][i] == offsets[term], term


def test_positions_random_access(spark, pos_export_setup):
    from terrier_ef_spark.query.engine import decode_positions_df

    idx, prefix, _, _ = pos_export_setup
    pdf = decode_positions_df(idx).toPandas()
    terms = sorted(pdf["term"].unique())
    for term in (terms[0], terms[len(terms) // 2], terms[-1]):
        docids, tfs, plists = read_term_from_bitfiles(
            prefix, term, with_positions=True)
        g = pdf[pdf["term"] == term].sort_values(["docid", "pos"])
        want = {int(d): gg["pos"].to_list()
                for d, gg in g.groupby("docid", sort=True)}
        got = {int(d): p.tolist() for d, p in zip(docids, plists)}
        assert got == want, term


def test_positional_partition_merge(spark, pos_export_setup):
    """Byte-append + offset-rebase merge over all three streams; b-side
    positions random access goes through the rebased pos offsets."""
    from terrier_ef_spark.query.engine import decode_positions_df

    idx, _, _, root = pos_export_setup
    pdf = decode_positions_df(idx).toPandas()
    terms = sorted(pdf["term"].unique())
    cut = len(terms) // 2
    pa_, pb = str(root / "pa"), str(root / "pb")
    export_terrier_bitfiles(idx, pa_, terms=terms[:cut])
    export_terrier_bitfiles(idx, pb, terms=terms[cut:])
    out = str(root / "pm")
    props = export_merge_bitfiles(pa_, pb, out)
    assert props["positions_bits"] > 0
    probe = terms[-1]
    docids, tfs, plists = read_term_from_bitfiles(
        out, probe, with_positions=True)
    g = pdf[pdf["term"] == probe].sort_values(["docid", "pos"])
    want = {int(d): gg["pos"].to_list()
            for d, gg in g.groupby("docid", sort=True)}
    assert {int(d): p.tolist() for d, p in zip(docids, plists)} == want


def test_index_from_bitfiles_migration(spark, export_setup, tmp_path):
    """The full migration: exported bitfiles -> rebuilt Parquet index.
    Postings round-trip exactly, reconstructed doclens equal the source
    (sum-of-tf identity), and BM25 answers are rank+score identical."""
    from terrier_ef_spark.index.export import index_from_bitfiles
    from terrier_ef_spark.query.engine import run_queries

    src_idx, prefix, _, rows, _ = export_setup
    re_idx = index_from_bitfiles(spark, prefix, str(tmp_path / "reidx"),
                                 block_bits=5, n_partitions=2)
    got = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in decode_postings(re_idx).collect()
    )
    assert got == rows
    src_dl = {(r["docid"], r["doclen"]) for r in src_idx.docs.collect()}
    new_dl = {(r["docid"], r["doclen"]) for r in re_idx.docs.collect()}
    assert new_dl == src_dl
    for k in ("num_docs", "num_terms", "num_postings", "num_tokens", "avgdl"):
        assert re_idx.stats[k] == src_idx.stats[k], k
    qs = [{"qid": 1, "terms": ["import", "def"], "mode": "disjunctive"},
          {"qid": 2, "terms": ["class", "return"], "mode": "conjunctive"}]
    ra = run_queries(src_idx, qs, k=10).orderBy("qid", "rank").collect()
    rb = run_queries(re_idx, qs, k=10).orderBy("qid", "rank").collect()
    assert [(r.qid, r.rank, r.docid, round(r.score, 9)) for r in ra] == \
           [(r.qid, r.rank, r.docid, round(r.score, 9)) for r in rb]


def test_export_of_compacted_index_with_docid_gaps(spark, tmp_path):
    """Compaction leaves docid holes (max docid > num_docs) — the
    export must encode at the recorded docid bound, not the doc count,
    and round-trip exactly (regression: 'prefix sum exceeds bound')."""
    from terrier_ef_spark.index.maintenance import compact_index, delete_docs

    corpus = synthesize_corpus(spark, 40, seed=83, n_partitions=2)
    idx = build_index(spark, corpus, str(tmp_path / "i"),
                      log2_quantum=LOG2Q, block_bits=5, n_partitions=2)
    delete_docs(idx, [0, 1, 2])  # low ids -> max docid 39 > 37 live docs
    cmp_idx = compact_index(idx, str(tmp_path / "c"), n_partitions=2)
    assert cmp_idx.stats["num_docs"] == 37
    prefix = str(tmp_path / "ef")
    props = export_terrier_bitfiles(cmp_idx, prefix)
    assert props["docid_bound"] == 40 and props["num_docs"] == 37
    rows = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in decode_postings(cmp_idx).collect()
    )
    got = sorted(
        (r["term"], r["docid"], r["tf"])
        for r in import_terrier_bitfiles(spark, prefix).collect()
    )
    assert got == rows and max(r[1] for r in got) == 39
