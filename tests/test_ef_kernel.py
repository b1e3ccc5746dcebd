"""EF kernel unit + property tests (FIXTURES.md F5).

Mirrors the reference's differential-test discipline
(IndexReadingTest.java:89-214) at the codec level: every encode is
cross-checked byte-for-byte against a slow loop-based mirror of
SequenceEncoder.java, and every decode must round-trip losslessly.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terrier_ef_spark import ef
from tests.slow_ef_reference import slow_encode


def gaps_of(docids):
    return np.diff(np.asarray(docids, dtype=np.int64), prepend=np.int64(0))


# ---------------------------------------------------------------------------
# Hand-computed / edge-case vectors (FIXTURES.md F5)
# ---------------------------------------------------------------------------

CASES_DOCIDS = [
    ([0], 1),                       # single posting, minimal universe
    ([0], 100),
    ([5], 100),
    ([0, 1, 2, 3], 4),              # dense: all gaps 1
    ([0, 1, 2, 3], 1000),           # sparse universe
    ([7, 13, 114, 999], 1000),
    (list(range(0, 200, 2)), 200),  # length crosses 64-bit word boundary
    (list(range(100)), 100_000),    # many skip quanta at log2q=3
    ([99_999], 100_000),
    (list(np.cumsum(np.arange(1, 60)) - 1), 2000),
]


@pytest.mark.parametrize("docids,n_docs", CASES_DOCIDS)
@pytest.mark.parametrize("log2q", [3, 8])
def test_docids_match_slow_encoder_and_roundtrip(docids, n_docs, log2q):
    blob = ef.encode_docids(docids, n_docs, log2q)
    slow = slow_encode(gaps_of(docids), n_docs, False, True, log2q)
    assert blob == slow
    out = ef.decode_docids(blob, len(docids), n_docs, log2q)
    assert out.tolist() == list(docids)


CASES_FREQS = [
    ([1], 1),          # tf all 1 (strict-mode floor), cf == df -> l == 0
    ([1, 1, 1, 1], 4),
    ([3], 3),
    ([1, 2, 3, 4], 10),
    ([5, 1, 1, 7, 2], 16),
    ([1] * 100, 100),
    (list(range(1, 50)), sum(range(1, 50))),
]


@pytest.mark.parametrize("tfs,cf", CASES_FREQS)
@pytest.mark.parametrize("log2q", [3, 8])
def test_freqs_match_slow_encoder_and_roundtrip(tfs, cf, log2q):
    blob = ef.encode_freqs(tfs, cf, log2q)
    slow = slow_encode(np.asarray(tfs, dtype=np.int64), cf, True, False, log2q)
    assert blob == slow
    out = ef.decode_freqs(blob, len(tfs), cf, log2q)
    assert out.tolist() == list(tfs)


def test_positions_roundtrip():
    pos_lists = [[0, 3, 9], [1], [2, 4], [0, 1, 2, 3, 4]]
    tfs = np.array([len(p) for p in pos_lists])
    sum_max_pos = sum(p[-1] for p in pos_lists)
    for log2q in (3, 8):
        blob = ef.encode_positions(
            [np.array(p) for p in pos_lists], len(pos_lists), sum_max_pos, log2q
        )
        out = ef.decode_positions(blob, tfs, len(pos_lists), sum_max_pos, log2q)
        assert [o.tolist() for o in out] == pos_lists


def test_positions_first_element_offset():
    # first stored value is 1 + pos[0] (EliasFanoBlockEncoders.java:69):
    # a single posting with single position 0 encodes value 1 (strict ok)
    blob = ef.encode_positions([np.array([0])], 1, 0, 8)
    out = ef.decode_positions(blob, np.array([1]), 1, 0, 8)
    assert out[0].tolist() == [0]


def test_pointer_padding_is_exercised():
    # strict forward-pointer lists have exact pointer counts; docid lists
    # always reach ub via the sentinel so padding is a no-op — verify the
    # pointer array matches expectations in both cases at tiny quantum.
    docids = list(range(0, 64, 4))
    n_docs = 1 << 12
    blob = ef.encode_docids(docids, n_docs, 3)
    m = len(docids) + 1
    ptrs = ef.ef_pointers(blob, len(docids), n_docs, strict=False, index_zeroes=True,
                          log2_quantum=3)
    n_exp = ef.number_of_pointers(m, n_docs, 3, False, True)
    assert len(ptrs) == n_exp
    # each non-zero pointer must point just past the k*8-th zero in upper bits
    cps = ef.ef_decode_prefix_sums(blob, len(docids), n_docs, strict=False,
                                   index_zeroes=True, log2_quantum=3)
    l = ef.lower_bits(m, n_docs, False)
    high = (cps >> l).astype(np.int64)
    for k, p in enumerate(ptrs, start=1):
        mth = k * 8
        if mth <= int(high[-1]):
            expected = mth + int(np.searchsorted(high, mth, side="left"))
            assert int(p) == expected
        else:
            assert int(p) == 0


def test_empty_list():
    blob = ef.encode_docids([], 100, 8)
    out = ef.decode_docids(blob, 0, 100, 8)
    assert len(out) == 0


def test_cursor_next_and_next_geq_semantics():
    docids = [3, 8, 21, 22, 40, 77]
    blob = ef.encode_docids(docids, 100, 3)
    cur = ef.DocidCursor(blob, len(docids), 100, 3)
    assert [cur.next() for _ in range(7)] == docids + [-1]
    # skip to every docid, to docid+1, to absent targets (IndexReadingTest:120-214)
    cur = ef.DocidCursor(blob, len(docids), 100, 3)
    assert cur.next_geq(0) == 3
    assert cur.next_geq(3) == 3       # current >= target -> stay
    assert cur.next_geq(4) == 8
    assert cur.next_geq(9) == 21
    assert cur.next_geq(22) == 22
    assert cur.next_geq(41) == 77
    assert cur.next_geq(78) == -1     # past last
    cur2 = ef.DocidCursor(blob, len(docids), 100, 3)
    assert cur2.next_geq(100) == -1   # target >= N


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=300),
    st.integers(min_value=3, max_value=8),
)
def test_property_docids(raw, log2q):
    docids = sorted(set(raw))
    n_docs = docids[-1] + 1 + (raw[0] % 100)
    blob = ef.encode_docids(docids, n_docs, log2q)
    slow = slow_encode(gaps_of(docids), n_docs, False, True, log2q)
    assert blob == slow
    assert ef.decode_docids(blob, len(docids), n_docs, log2q).tolist() == docids


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=300),
    st.integers(min_value=3, max_value=8),
)
def test_property_freqs(tfs, log2q):
    cf = sum(tfs)
    blob = ef.encode_freqs(tfs, cf, log2q)
    slow = slow_encode(np.asarray(tfs, dtype=np.int64), cf, True, False, log2q)
    assert blob == slow
    assert ef.decode_freqs(blob, len(tfs), cf, log2q).tolist() == tfs


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=3, max_value=8),
)
def test_property_positions(rawlists, log2q):
    pos_lists = [sorted(set(p)) for p in rawlists]
    tfs = np.array([len(p) for p in pos_lists])
    smp = sum(p[-1] for p in pos_lists)
    blob = ef.encode_positions([np.array(p) for p in pos_lists], len(pos_lists), smp, log2q)
    out = ef.decode_positions(blob, tfs, len(pos_lists), smp, log2q)
    assert [o.tolist() for o in out] == pos_lists


def test_gamma_roundtrip():
    vals = [0, 1, 2, 3, 7, 8, 100, 1023, 1 << 20]
    blob = ef.write_gamma_array(vals)
    out = ef.read_gamma_array(blob, len(vals))
    assert out.tolist() == vals


def test_bits_per_posting_near_information_bound():
    # structural bound ~ 2 + ceil(log2(N/df)) bits/docid (BASELINE.md)
    rng = np.random.default_rng(42)
    n_docs = 1_000_000
    docids = np.sort(rng.choice(n_docs, size=10_000, replace=False))
    blob = ef.encode_docids(docids, n_docs, 8)
    bpp = len(blob) * 8 / len(docids)
    bound = 2 + np.ceil(np.log2(n_docs / len(docids)))
    assert bpp < bound + 2.0  # pointer + word-padding overhead margin


def test_corrupt_blob_detected():
    """Truncated or mis-sized blobs raise instead of returning garbage
    (the verify-recipe misuse probes, made permanent)."""
    import numpy as np
    import pytest

    from terrier_ef_spark import ef

    docids = np.arange(0, 500, 5, dtype=np.int64)
    blob = ef.encode_docids(docids, 1000, 8)
    with pytest.raises(ValueError):
        ef.decode_docids(blob[: len(blob) // 2], len(docids), 1000, 8)
    # wrong df larger than encoded count must also fail loudly
    with pytest.raises(ValueError):
        ef.decode_docids(blob, len(docids) + 40, 1000, 8)


def test_quantum_range_decode_matches_full():
    """decode_*_quanta over every quantum window == the corresponding
    slice of the whole-list decode, across list shapes (dense/sparse,
    short/long, clustered), quantum sizes, and window positions."""
    import numpy as np

    from terrier_ef_spark import ef

    rng = np.random.default_rng(7)
    cases = []
    for n, ub in ((5, 40), (17, 64), (200, 1000), (1000, 1_000_000), (513, 520)):
        docids = np.sort(rng.choice(ub, size=n, replace=False)).astype(np.int64)
        cases.append((docids, ub))
    # clustered docids (small gaps then huge gap)
    c = np.concatenate([np.arange(100), np.arange(90_000, 90_050)]).astype(np.int64)
    cases.append((c, 100_000))

    for log2q in (3, 8):
        q = 1 << log2q
        for docids, ub in cases:
            n = len(docids)
            tfs = rng.integers(1, 50, size=n).astype(np.int64)
            cf = int(tfs.sum())
            dblob = ef.encode_docids(docids, ub, log2q)
            fblob = ef.encode_freqs(tfs, cf, log2q)
            n_q = (n + q - 1) // q
            q_last = docids[np.minimum(np.arange(1, n_q + 1) * q - 1, n - 1)]
            full_d = ef.decode_docids(dblob, n, ub, log2q)
            full_f = ef.decode_freqs(fblob, n, cf, log2q)
            assert full_d.tolist() == docids.tolist()
            windows = [(0, 1), (0, n_q), (n_q - 1, n_q)]
            if n_q > 2:
                windows += [(1, 2), (1, n_q), (n_q // 2, n_q // 2 + 2)]
            for j0, j1 in windows:
                a, e = j0 * q, min(j1 * q, n)
                got_d = ef.decode_docids_quanta(dblob, n, ub, q_last, j0, j1, log2q)
                assert got_d.tolist() == full_d[a:e].tolist(), (n, ub, log2q, j0, j1)
                got_f = ef.decode_freqs_quanta(fblob, n, cf, j0, j1, log2q)
                assert got_f.tolist() == full_f[a:e].tolist(), (n, ub, log2q, j0, j1)


def test_quantum_range_decode_misuse_probes():
    """Partial decode must fail loudly on corrupt input, not return
    garbage: truncated blob, wrong df, out-of-range windows."""
    import numpy as np
    import pytest

    from terrier_ef_spark import ef

    rng = np.random.default_rng(3)
    docids = np.sort(rng.choice(100_000, size=600, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=600).astype(np.int64)
    cf = int(tfs.sum())
    dblob = ef.encode_docids(docids, 100_000, 8)
    fblob = ef.encode_freqs(tfs, cf, 8)
    q_last = docids[np.minimum(np.arange(1, 4) * 256 - 1, 599)]

    with pytest.raises(ValueError):
        ef.decode_docids_quanta(dblob[: len(dblob) // 3], 600, 100_000, q_last, 1, 3, 8)
    with pytest.raises(ValueError):
        ef.decode_freqs_quanta(fblob[:8], 600, cf, 1, 3, 8)
    # empty window is not an error — it is an empty result
    assert len(ef.decode_docids_quanta(dblob, 600, 100_000, q_last, 3, 5, 8)) == 0
    assert len(ef.decode_freqs_quanta(fblob, 600, cf, 3, 5, 8)) == 0


def test_quanta_multi_equals_per_run_and_full():
    """decode_*_quanta_multi over random scattered quanta selections ==
    the membership-filtered whole-list decode, across list shapes
    (dense/sparse, tiny/large, several quantum sizes)."""
    rng = np.random.default_rng(23)
    for trial in range(40):
        log2q = int(rng.integers(2, 9))
        num_docs = int(rng.integers(50, 60_000))
        df = int(rng.integers(1, max(2, num_docs)))
        docids = np.sort(rng.choice(num_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 40, size=df).astype(np.int64)
        cf = int(tfs.sum())
        dblob = ef.encode_docids(docids, num_docs, log2q)
        fblob = ef.encode_freqs(tfs, cf, log2q)
        q = 1 << log2q
        n_quanta = (df + q - 1) // q
        q_last = docids[np.minimum(np.arange(1, n_quanta + 1) * q - 1, df - 1)]
        # random quantum subset: scattered singletons + a consecutive run
        k = int(rng.integers(1, n_quanta + 1))
        qidx = np.unique(rng.choice(n_quanta, size=k, replace=False))
        keep = np.zeros(df, dtype=bool)
        for j in qidx:
            keep[j * q : min((j + 1) * q, df)] = True
        got_d = ef.decode_docids_quanta_multi(dblob, df, num_docs, q_last, qidx, log2q)
        got_f = ef.decode_freqs_quanta_multi(fblob, df, cf, qidx, log2q)
        assert np.array_equal(got_d, docids[keep]), (trial, log2q, df)
        assert np.array_equal(got_f, tfs[keep]), (trial, log2q, df)
    # empty selection
    assert len(ef.decode_docids_quanta_multi(dblob, df, num_docs, q_last, [], log2q)) == 0
    assert len(ef.decode_freqs_quanta_multi(fblob, df, cf, [], log2q)) == 0


def test_positions_ranges_equals_full():
    """decode_positions_ranges on random posting subsets == the full
    decode_positions segments, across list shapes and quantum sizes."""
    rng = np.random.default_rng(31)
    for trial in range(30):
        log2q = int(rng.integers(2, 9))
        df = int(rng.integers(1, 400))
        tfs = rng.integers(1, 15, size=df).astype(np.int64)
        plists = []
        maxpos = 0
        for tf in tfs:
            p = np.sort(rng.choice(500, size=tf, replace=False)).astype(np.int64)
            plists.append(p)
            maxpos += int(p.max())
        blob = ef.encode_positions(plists, df, maxpos, log2q)
        n_elems = int(tfs.sum())
        ub = df + maxpos
        full = ef.decode_positions(blob, tfs, df, maxpos, log2q)
        ends = np.cumsum(tfs)
        starts = ends - tfs
        k = int(rng.integers(1, df + 1))
        picks = np.sort(rng.choice(df, size=k, replace=False))
        ranges = np.stack([starts[picks], ends[picks]], axis=1)
        got = ef.decode_positions_ranges(blob, n_elems, ub, ranges, log2q)
        for want_i, got_i in zip(picks, got):
            assert np.array_equal(got_i, full[want_i]), (trial, log2q, want_i)
    assert ef.decode_positions_ranges(blob, n_elems, ub, [], log2q) == []


def test_quanta_multi_out_of_range_quanta_decode_nothing():
    """Quantum indices beyond the list decode to empty results (not an
    opaque broadcast crash) — misuse-probe discipline for the multi
    variants."""
    docids = np.array([3, 9, 20, 31, 55], dtype=np.int64)
    tfs = np.array([1, 4, 2, 2, 7], dtype=np.int64)
    blob = ef.encode_docids(docids, 100, 3)
    fblob = ef.encode_freqs(tfs, int(tfs.sum()), 3)
    q_last = docids[np.minimum(np.arange(1, 2) * 8 - 1, 4)]
    assert len(ef.decode_docids_quanta_multi(blob, 5, 100, q_last, [20, 25], 3)) == 0
    assert len(ef.decode_freqs_quanta_multi(fblob, 5, int(tfs.sum()), [20, 25], 3)) == 0


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=300),
                 min_size=1, max_size=40, unique=True),
        min_size=1, max_size=6,
    ),
    st.sampled_from([2, 3, 8]),
)
@settings(max_examples=60, deadline=None)
def test_unaligned_concat_decode_property(seqs, log2q):
    """The export-bridge core invariant: raw bit arrays of many EF
    sequences concatenated back-to-back WITHOUT word alignment decode
    correctly from their cumulative bit offsets (sequences are
    self-terminating; trailing stream content is ignored)."""
    streams = []
    offsets = []
    metas = []
    off = 0
    ub = 400
    for vals in seqs:
        docids = np.sort(np.asarray(vals, dtype=np.int64))
        gaps = np.diff(docids, prepend=np.int64(0))
        bits = ef.ef_encode_bits(gaps, ub, strict=False, index_zeroes=True,
                                 log2_quantum=log2q)
        offsets.append(off)
        metas.append(docids)
        streams.append(bits)
        off += len(bits)
    stream = np.concatenate(streams)
    for o, want in zip(offsets, metas):
        blob = ef._pack_blob([stream[o:]])
        cps = ef.ef_decode_prefix_sums(
            blob, len(want), ub, strict=False, index_zeroes=True,
            log2_quantum=log2q,
        )
        assert np.array_equal(cps[:-1], want)
