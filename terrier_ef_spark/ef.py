"""Quasi-succinct Elias-Fano codec, vectorized NumPy implementation.

Re-implements (from scratch, behavior only) the Elias-Fano sequence
encoding used by tonellotto/terrier-ef, which itself follows MG4J's
QuasiSuccinctIndexWriter (Vigna, "Quasi-succinct indices", WSDM'13):

- parameter formulas: ``/root/reference/.../util/EFUtils.java:48-91``
- encoder semantics (prefix sums, strict mode, skip/forward pointers,
  sentinel docid, pointer zero-padding, dump order
  ``[pointers][lower][upper]``): ``util/SequenceEncoder.java:143-225``
- bit order: LSB-first within 64-bit little-endian words
  (``util/LongWordBitWriter.java:81-105``)
- gamma / non-zero-gamma codes: ``util/LongWordBitWriter.java:153-169``
- docid read path (``l`` computed on numEntries+1, EOL when
  prefix-sum >= N): ``structures/EFBasicIterablePosting.java:76-95,146-159``
- strict (freq) decode ``tf[i] = ps[i] - ps[i-1] + 1``:
  ``util/FreqReader.java:107-167``
- positions layout (first element ``1 + pos[0]``, then deltas, upper
  bound ``num + sumMaxPos``): ``EliasFanoBlockEncoders.java:60-73``

Everything here is plain NumPy over whole arrays — no per-element Python
in encode or decode hot paths — so it can run inside Arrow-vectorized
Spark UDFs (``mapInPandas`` / ``applyInPandas``).
"""

from __future__ import annotations

import numpy as np

DEFAULT_LOG2_QUANTUM = 8  # Generator.java:278 default


# ---------------------------------------------------------------------------
# Parameter formulas (EFUtils.java semantics)
# ---------------------------------------------------------------------------

def msb(x: int) -> int:
    """Most significant bit index; -1 for x == 0 (Fast.mostSignificantBit)."""
    return int(x).bit_length() - 1


def ceil_log2(x: int) -> int:
    """ceil(log2(x)); 0 for x in {0, 1} after the max(0, .) guards below."""
    if x <= 1:
        return 0
    return int(x - 1).bit_length()


def lower_bits(length: int, upper_bound: int, strict: bool) -> int:
    """Number of lower bits l for an EF list (EFUtils.lowerBits)."""
    if length == 0:
        return 0
    return max(0, msb((upper_bound - (length if strict else 0)) // length))


def pointer_size(length: int, upper_bound: int, strict: bool, index_zeroes: bool) -> int:
    """Width in bits of one skip/forward pointer (EFUtils.pointerSize)."""
    l = lower_bits(length, upper_bound, strict)
    return max(
        0,
        ceil_log2(
            length
            + ((upper_bound - (length if strict else 0)) >> l)
            + (0 if index_zeroes else 1)
        ),
    )


def number_of_pointers(
    length: int, upper_bound: int, log2_quantum: int, strict: bool, index_zeroes: bool
) -> int:
    """Expected number of skip/forward pointers (EFUtils.numberOfPointers)."""
    if length == 0:
        return 0
    if index_zeroes:
        l = lower_bits(length, upper_bound, strict)
        return ((upper_bound - (length if strict else 0)) >> l) >> log2_quantum
    return length >> log2_quantum


# ---------------------------------------------------------------------------
# Bit packing helpers (LSB-first, little-endian words)
# ---------------------------------------------------------------------------

def _fields_to_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Pack each value's low `width` bits, LSB-first, into a uint8 bit array."""
    if width == 0 or len(values) == 0:
        return np.zeros(0, dtype=np.uint8)
    v = values.astype(np.int64, copy=False)
    shifts = np.arange(width, dtype=np.int64)
    return ((v[:, None] >> shifts) & 1).astype(np.uint8).ravel()


def _bits_to_fields(bits: np.ndarray, count: int, width: int) -> np.ndarray:
    """Inverse of _fields_to_bits: read `count` fields of `width` bits."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.int64)
    mat = bits[: count * width].astype(np.int64).reshape(count, width)
    weights = np.int64(1) << np.arange(width, dtype=np.int64)
    return mat @ weights


def _pack_blob(bit_segments: list[np.ndarray]) -> bytes:
    """Concatenate bit segments and pack to little-endian bytes padded to
    a 64-bit word boundary (LongWordBitWriter word discipline)."""
    bits = np.concatenate(bit_segments) if bit_segments else np.zeros(0, dtype=np.uint8)
    packed = np.packbits(bits, bitorder="little")
    pad = (-len(packed)) % 8
    if pad:
        packed = np.concatenate([packed, np.zeros(pad, dtype=np.uint8)])
    return packed.tobytes()


def _unpack_blob(blob: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(blob, dtype=np.uint8), bitorder="little")


def _read_fields_starts(blob: bytes, starts: np.ndarray, width: int) -> np.ndarray:
    """Gather LSB-first `width`-bit fields at arbitrary bit positions
    `starts` from the packed little-endian byte buffer — no per-bit
    expansion. Each field reads a little-endian window at its byte,
    then shifts/masks; valid for width <= 57 (window must hold
    bit-in-byte skew + width)."""
    if width == 0 or len(starts) == 0:
        return np.zeros(len(starts), dtype=np.int64)
    # smallest window that holds in-byte skew (<=7) + width
    if width <= 9:
        wb, dt = 2, "<u2"
    elif width <= 25:
        wb, dt = 4, "<u4"
    else:
        wb, dt = 8, "<u8"
    buf = np.frombuffer(blob, dtype=np.uint8)
    byte_idx = starts >> 3
    need = int(byte_idx.max()) + wb
    if need > len(buf):
        buf = np.concatenate([buf, np.zeros(need - len(buf), dtype=np.uint8)])
    windows = buf[byte_idx[:, None] + np.arange(wb, dtype=np.int64)]
    words = np.ascontiguousarray(windows).view(dt).ravel().astype(np.uint64)
    shifts = (starts & 7).astype(np.uint64)
    mask = np.uint64((1 << width) - 1)
    return ((words >> shifts) & mask).astype(np.int64)


def _read_fields_packed(
    blob: bytes, bit_offset: int, count: int, width: int
) -> np.ndarray:
    """Read `count` consecutive fields starting at `bit_offset`."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.int64)
    starts = bit_offset + width * np.arange(count, dtype=np.int64)
    return _read_fields_starts(blob, starts, width)


# ---------------------------------------------------------------------------
# Core encode/decode of one EF sequence
# ---------------------------------------------------------------------------

def ef_encode_bits(
    values,
    upper_bound: int,
    *,
    strict: bool,
    index_zeroes: bool,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Encode one EF sequence to its raw LSB-first bit array (uint8 0/1,
    no word padding). ef_encode packs this into a padded blob; the
    Terrier-layout export (index/export.py) concatenates these bit
    arrays back-to-back into ONE continuous bitstream with per-term bit
    offsets, exactly how the reference's global bitfiles are laid out
    (EliasFanoWriters.java:32-48 — sequences are NOT word-aligned
    inside the file; only the file tail is padded).

    `values` are the raw per-element increments exactly as fed to
    SequenceEncoder.add(): docid gaps for docid lists, tf values for
    frequency lists, (1+pos0, deltas...) for position lists.

    Layout: [pointers][lower bits][upper bits]. For non-strict
    indexZeroes lists a sentinel element raising the prefix sum to
    `upper_bound` is appended (SequenceEncoder.dump:212-215); skip
    pointers are zero-padded to the expected count (dump:216-218).
    """
    v = np.asarray(values, dtype=np.int64)
    n = int(len(v))
    if strict and n and int(v.min()) < 1:
        raise ValueError("strict EF list cannot contain zeroes")
    corrected_ub = upper_bound - (n if strict else 0)
    if corrected_ub < 0:
        raise ValueError("upper bound too small")
    # prefix sums after each add(); strict subtracts 1 per element
    cps = np.cumsum(v, dtype=np.int64)
    if strict:
        cps = cps - np.arange(1, n + 1, dtype=np.int64)
    if n and int(cps[-1]) > corrected_ub:
        raise ValueError(f"prefix sum {int(cps[-1])} exceeds bound {corrected_ub}")

    sentinel = (not strict) and index_zeroes
    if sentinel:
        cps = np.append(cps, np.int64(corrected_ub))
    m = int(len(cps))  # "corrected length" incl. sentinel

    l = lower_bits(m, upper_bound, strict)
    psize = pointer_size(m, upper_bound, strict, index_zeroes)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, strict, index_zeroes)

    if m == 0:
        return np.zeros(0, dtype=np.uint8)

    high = cps >> np.int64(l)
    one_pos = high + np.arange(m, dtype=np.int64)

    # pointers
    q = 1 << log2_quantum
    if psize > 0 and n_ptrs > 0:
        if index_zeroes:
            # skip pointers: position+1 of every q-th zero in the upper array.
            # the k*q-th zero sits at (k*q - 1) + #{i: high[i] < k*q}
            total_zeroes = int(high[-1])
            actual = total_zeroes >> log2_quantum
            ks = (np.arange(1, actual + 1, dtype=np.int64)) * q
            ptr_vals = ks + np.searchsorted(high, ks, side="left")
            if actual < n_ptrs:  # zero-pad (dump:216-218)
                ptr_vals = np.concatenate(
                    [ptr_vals, np.zeros(n_ptrs - actual, dtype=np.int64)]
                )
        else:
            # forward pointers: upper position + 1 of every q-th element
            ptr_vals = one_pos[q - 1 :: q][:n_ptrs] + 1
        ptr_bits = _fields_to_bits(ptr_vals, psize)
    else:
        ptr_bits = np.zeros(0, dtype=np.uint8)

    lower_seg = _fields_to_bits(cps & np.int64((1 << l) - 1), l)

    upper_len = int(one_pos[-1]) + 1
    upper_seg = np.zeros(upper_len, dtype=np.uint8)
    upper_seg[one_pos] = 1

    return np.concatenate([ptr_bits, lower_seg, upper_seg])


def ef_encode(
    values,
    upper_bound: int,
    *,
    strict: bool,
    index_zeroes: bool,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> bytes:
    """Encode one EF sequence as a self-contained blob: the raw bits of
    ef_encode_bits packed LSB-first into little-endian 64-bit words."""
    return _pack_blob([
        ef_encode_bits(
            values, upper_bound, strict=strict,
            index_zeroes=index_zeroes, log2_quantum=log2_quantum,
        )
    ])


def ef_decode_prefix_sums(
    blob: bytes,
    n: int,
    upper_bound: int,
    *,
    strict: bool,
    index_zeroes: bool,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Whole-list decode of the prefix-sum sequence (incl. sentinel)."""
    m = n + (1 if (not strict) and index_zeroes else 0)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    l = lower_bits(m, upper_bound, strict)
    psize = pointer_size(m, upper_bound, strict, index_zeroes)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, strict, index_zeroes)

    off = n_ptrs * psize
    upper_bit0 = off + m * l
    if l <= 57:
        lower = _read_fields_packed(blob, off, m, l)
    else:  # pathological width; fall back to the bit-expanded path
        bits = _unpack_blob(blob)
        lower = _bits_to_fields(bits[off : off + m * l], m, l)
    # expand ONLY the upper-bits segment (byte-aligned slice, then drop
    # the leading in-byte skew)
    ubits = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8)[upper_bit0 >> 3 :], bitorder="little"
    )
    ones = (np.flatnonzero(ubits) - (upper_bit0 & 7))
    ones = ones[ones >= 0][:m].astype(np.int64)
    if len(ones) != m:
        raise ValueError(f"corrupt EF blob: expected {m} upper bits, got {len(ones)}")
    high = ones - np.arange(m, dtype=np.int64)
    return (high << np.int64(l)) | lower


def ef_pointers(
    blob: bytes,
    n: int,
    upper_bound: int,
    *,
    strict: bool,
    index_zeroes: bool,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Read back the raw pointer array of a blob (for skip-parity tests)."""
    m = n + (1 if (not strict) and index_zeroes else 0)
    psize = pointer_size(m, upper_bound, strict, index_zeroes)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, strict, index_zeroes)
    bits = _unpack_blob(blob)
    return _bits_to_fields(bits[: n_ptrs * psize], n_ptrs, psize)


# ---------------------------------------------------------------------------
# Docid / freq / position wrappers (the three index columns)
# ---------------------------------------------------------------------------

def encode_docids(docids, num_docs: int, log2_quantum: int = DEFAULT_LOG2_QUANTUM) -> bytes:
    """Encode a strictly-increasing docid list (absolute ids, gap-coded
    internally; EliasFanoEncoders.java:41-49). Non-strict, indexZeroes,
    trailing sentinel == num_docs."""
    d = np.asarray(docids, dtype=np.int64)
    if len(d) and (int(d[0]) < 0 or np.any(np.diff(d) <= 0)):
        raise ValueError("docids must be non-negative and strictly increasing")
    gaps = np.diff(d, prepend=np.int64(0))
    return ef_encode(
        gaps, num_docs, strict=False, index_zeroes=True, log2_quantum=log2_quantum
    )


def decode_docids(
    blob: bytes, df: int, num_docs: int, log2_quantum: int = DEFAULT_LOG2_QUANTUM
) -> np.ndarray:
    cps = ef_decode_prefix_sums(
        blob, df, num_docs, strict=False, index_zeroes=True, log2_quantum=log2_quantum
    )
    return cps[:-1]  # drop sentinel


def encode_freqs(tfs, cf: int, log2_quantum: int = DEFAULT_LOG2_QUANTUM) -> bytes:
    """Encode a tf sequence (each >= 1): strict, forward pointers,
    upper bound = collection frequency (BasicCompressor.java:112)."""
    return ef_encode(
        tfs, cf, strict=True, index_zeroes=False, log2_quantum=log2_quantum
    )


def decode_freqs(
    blob: bytes, df: int, cf: int, log2_quantum: int = DEFAULT_LOG2_QUANTUM
) -> np.ndarray:
    cps = ef_decode_prefix_sums(
        blob, df, cf, strict=True, index_zeroes=False, log2_quantum=log2_quantum
    )
    return np.diff(cps, prepend=np.int64(0)) + 1  # FreqReader.java:118,166


def encode_positions(
    pos_lists: list[np.ndarray],
    num_postings: int,
    sum_max_pos: int,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> bytes:
    """Encode all postings' positions as one strict EF sequence:
    per posting [1 + pos[0], deltas...], ub = num + sumMaxPos
    (EliasFanoBlockEncoders.java:60-73)."""
    vals = []
    for p in pos_lists:
        p = np.asarray(p, dtype=np.int64)
        v = np.diff(p, prepend=np.int64(-1))  # first element becomes pos[0]+1
        vals.append(v)
    flat = np.concatenate(vals) if vals else np.zeros(0, dtype=np.int64)
    return ef_encode(
        flat,
        num_postings + sum_max_pos,
        strict=True,
        index_zeroes=False,
        log2_quantum=log2_quantum,
    )


def decode_positions(
    blob: bytes,
    tfs: np.ndarray,
    num_postings: int,
    sum_max_pos: int,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> list[np.ndarray]:
    """Decode back to one position array per posting (lazy decode in the
    reference, EFBlockIterablePosting.java:94-106; whole-list here)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    cf = int(tfs.sum())
    cps = ef_decode_prefix_sums(
        blob,
        cf,
        num_postings + sum_max_pos,
        strict=True,
        index_zeroes=False,
        log2_quantum=log2_quantum,
    )
    vals = np.diff(cps, prepend=np.int64(0)) + 1
    # per-posting: positions = cumsum(segment) - 1
    ends = np.cumsum(tfs)
    starts = ends - tfs
    cum = np.cumsum(vals)
    base = np.zeros(len(tfs), dtype=np.int64)
    base[1:] = cum[ends[:-1] - 1]
    flat_pos = cum - np.repeat(base, tfs) - 1
    return [flat_pos[s:e] for s, e in zip(starts, ends)]


# ---------------------------------------------------------------------------
# Quantum-range (block-selective) partial decode — the vectorized
# equivalent of the reference's skipTo + partial read
# (EFBasicIterablePosting.java:163-178, DocidReader.java:118-183): for
# conjunctive/BMW queries only the quanta that can contain candidates
# are decoded; cold quanta's bytes are never unpacked.
# ---------------------------------------------------------------------------

def decode_docids_quanta(
    blob: bytes,
    df: int,
    upper_bound: int,
    q_last_rel,
    j0: int,
    j1: int,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Decode only elements [j0*q, min(j1*q, df)) of a docid blob.

    Entry offsets derive from the stored per-quantum boundary docids
    (`q_last_rel`, block-relative): the one-bit position of element i is
    exactly (docid_i >> l) + i, so q_last IS the skip index — the same
    information the reference reads from its zero-pointers, already
    materialized as BMW metadata. Only the byte range holding the
    selected quanta's upper bits is unpacked; lower bits are direct
    packed-field reads at a*l."""
    q = 1 << log2_quantum
    m = df + 1  # sentinel (non-strict indexZeroes list)
    l = lower_bits(m, upper_bound, False)
    psize = pointer_size(m, upper_bound, False, True)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, False, True)
    off = n_ptrs * psize
    a = j0 * q
    e = min(j1 * q, df)
    count = e - a
    if count <= 0:
        return np.zeros(0, dtype=np.int64)
    q_last_rel = np.asarray(q_last_rel, dtype=np.int64)
    if l > 57:  # pathological width; whole-list fallback
        full = decode_docids(blob, df, upper_bound, log2_quantum)
        return full[a:e]
    lower = _read_fields_packed(blob, off + a * l, count, l)
    upper_bit0 = off + m * l
    prev_pos = -1 if a == 0 else (int(q_last_rel[j0 - 1]) >> l) + (a - 1)
    last_pos = (int(q_last_rel[j1 - 1]) >> l) + (e - 1)
    bit_lo = upper_bit0 + prev_pos + 1
    bit_hi = upper_bit0 + last_pos + 1  # exclusive
    buf = np.frombuffer(blob, dtype=np.uint8)[bit_lo >> 3 : (bit_hi + 7) >> 3]
    ubits = np.unpackbits(buf, bitorder="little")
    ones = np.flatnonzero(ubits) + ((bit_lo >> 3) << 3) - upper_bit0
    ones = ones[(ones > prev_pos) & (ones <= last_pos)]
    if len(ones) != count:
        raise ValueError(
            f"corrupt EF blob: expected {count} upper bits in quanta "
            f"[{j0},{j1}), got {len(ones)}"
        )
    high = ones.astype(np.int64) - np.arange(a, e, dtype=np.int64)
    return (high << np.int64(l)) | lower


def decode_freqs_quanta(
    blob: bytes,
    df: int,
    cf: int,
    j0: int,
    j1: int,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Decode only tf values of elements [j0*q, min(j1*q, df)) of a freq
    blob. Entry offset comes from the blob's own forward pointers
    (every q-th one-bit position, element-indexed — the strict-list
    pointer family, SequenceEncoder.java:216-218); cps[a-1] is
    reconstructed from pointer + direct lower-field read, so the diff
    chain tf[i] = cps[i] - cps[i-1] + 1 stays exact."""
    q = 1 << log2_quantum
    m = df
    l = lower_bits(m, cf, True)
    psize = pointer_size(m, cf, True, False)
    n_ptrs = number_of_pointers(m, cf, log2_quantum, True, False)
    off = n_ptrs * psize
    a = j0 * q
    e = min(j1 * q, df)
    count = e - a
    if count <= 0:
        return np.zeros(0, dtype=np.int64)
    if (a > 0 and (psize == 0 or j0 > n_ptrs)) or l > 57:
        # no pointer reaches the start (tiny list) or pathological width:
        # whole-list fallback
        return decode_freqs(blob, df, cf, log2_quantum)[a:e]
    upper_bit0 = off + m * l
    if a == 0:
        prev_pos, prev_cps = -1, 0
    else:
        ptr = int(_read_fields_packed(blob, (j0 - 1) * psize, 1, psize)[0])
        prev_pos = ptr - 1  # one-bit position of element a-1
        prev_high = prev_pos - (a - 1)
        prev_lower = int(_read_fields_packed(blob, off + (a - 1) * l, 1, l)[0])
        prev_cps = (prev_high << l) | prev_lower
    lower = _read_fields_packed(blob, off + a * l, count, l)
    if j1 <= n_ptrs:
        last_pos = int(_read_fields_packed(blob, (j1 - 1) * psize, 1, psize)[0]) - 1
    else:
        last_pos = len(blob) * 8 - upper_bit0 - 1  # tail quantum: to blob end
    bit_lo = upper_bit0 + prev_pos + 1
    bit_hi = upper_bit0 + last_pos + 1
    buf = np.frombuffer(blob, dtype=np.uint8)[bit_lo >> 3 : (bit_hi + 7) >> 3]
    ubits = np.unpackbits(buf, bitorder="little")
    ones = np.flatnonzero(ubits) + ((bit_lo >> 3) << 3) - upper_bit0
    ones = ones[(ones > prev_pos) & (ones <= last_pos)][:count]
    if len(ones) != count:
        raise ValueError(
            f"corrupt EF blob: expected {count} upper bits in quanta "
            f"[{j0},{j1}), got {len(ones)}"
        )
    high = ones.astype(np.int64) - np.arange(a, e, dtype=np.int64)
    cps = (high << np.int64(l)) | lower
    return np.diff(cps, prepend=np.int64(prev_cps)) + 1


def _runs_of(qidx: np.ndarray, q: int, df: int):
    """Merge sorted-unique quantum indices into maximal consecutive runs.
    Returns (j0s, j1s, a, e, counts, starts_cum, idx): run starts/ends
    (exclusive), element ranges [a, e), per-run counts, run offsets in
    the output, and the concatenated element-index array."""
    cut = np.flatnonzero(np.diff(qidx) > 1) + 1
    j0s = qidx[np.concatenate([[0], cut])]
    j1s = qidx[np.concatenate([cut - 1, [len(qidx) - 1]])] + 1
    a = j0s * q
    e = np.minimum(j1s * q, df)
    counts = e - a
    keep = counts > 0
    j0s, j1s, a, e, counts = j0s[keep], j1s[keep], a[keep], e[keep], counts[keep]
    if len(counts) == 0:  # every selected quantum lies beyond the list
        z = np.zeros(0, dtype=np.int64)
        return j0s, j1s, a, e, counts, z, z
    total = int(counts.sum())
    starts_cum = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(starts_cum, counts)
        + np.repeat(a, counts)
    )
    return j0s, j1s, a, e, counts, starts_cum, idx


def _gather_upper_ones(
    blob: bytes,
    upper_bit0: int,
    prev_pos: np.ndarray,
    last_pos: np.ndarray,
    counts: np.ndarray,
):
    """One unpackbits pass over the UNION of the runs' upper-bit byte
    ranges: returns (pos, run_of) — blob-global one-bit positions
    (relative to upper_bit0) in run-major ascending order, filtered to
    each run's (prev_pos, last_pos] window and truncated to its count
    (tail padding bits beyond the last element are dropped)."""
    bit_lo = upper_bit0 + prev_pos + 1
    bit_hi = upper_bit0 + last_pos + 1
    byte_lo = bit_lo >> 3
    byte_hi = np.minimum((bit_hi + 7) >> 3, len(blob))
    buf = np.frombuffer(blob, dtype=np.uint8)
    segs = [buf[lo:hi] for lo, hi in zip(byte_lo, byte_hi)]
    allbits = np.unpackbits(np.concatenate(segs), bitorder="little")
    seg_bits = (byte_hi - byte_lo) * 8
    seg_starts = np.concatenate([[0], np.cumsum(seg_bits)[:-1]]).astype(np.int64)
    ones = np.flatnonzero(allbits)
    run_of = np.searchsorted(seg_starts, ones, side="right") - 1
    pos = ones - seg_starts[run_of] + (byte_lo[run_of] << 3) - upper_bit0
    ok = (pos > prev_pos[run_of]) & (pos <= last_pos[run_of])
    pos, run_of = pos[ok], run_of[ok]
    # truncate each run to its expected count (tail run may extend to
    # blob end and catch padding ones)
    first_of_run = np.searchsorted(run_of, np.arange(len(counts)))
    rank = np.arange(len(pos), dtype=np.int64) - first_of_run[run_of]
    ok = rank < counts[run_of]
    return pos[ok], run_of[ok]


def decode_docids_quanta_multi(
    blob: bytes,
    df: int,
    upper_bound: int,
    q_last_rel,
    qidx,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
    with_indices: bool = False,
):
    """Decode ALL quanta in sorted-unique `qidx` in ONE vectorized pass
    (concatenated, run-major ascending) — the batched replacement for a
    per-run decode_docids_quanta loop. Measured: the per-run call costs
    ~19us of fixed overhead, so scattered-candidate workloads (hundreds
    of singleton runs) pay run-count x overhead; here lower bits of all
    runs gather in one _read_fields_starts and all upper-bit ranges
    unpack in one unpackbits pass."""
    qidx = np.asarray(qidx, dtype=np.int64)
    if len(qidx) == 0:
        z = np.zeros(0, dtype=np.int64)
        return (z, z) if with_indices else z
    q = 1 << log2_quantum
    m = df + 1  # sentinel (non-strict indexZeroes list)
    l = lower_bits(m, upper_bound, False)
    if l > 57:  # pathological width; whole-list fallback
        full = decode_docids(blob, df, upper_bound, log2_quantum)
        keep = np.zeros(df, dtype=bool)
        for j in qidx:
            keep[j * q : min((j + 1) * q, df)] = True
        return (full[keep], np.flatnonzero(keep)) if with_indices else full[keep]
    psize = pointer_size(m, upper_bound, False, True)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, False, True)
    off = n_ptrs * psize
    upper_bit0 = off + m * l
    q_last_rel = np.asarray(q_last_rel, dtype=np.int64)

    j0s, j1s, a, e, counts, _, idx = _runs_of(qidx, q, df)
    if len(counts) == 0:
        z = np.zeros(0, dtype=np.int64)
        return (z, z) if with_indices else z
    lower = _read_fields_starts(blob, off + idx * l, l)
    prev_pos = np.where(a == 0, -1, (q_last_rel[j0s - 1] >> l) + (a - 1))
    last_pos = (q_last_rel[j1s - 1] >> l) + (e - 1)
    pos, run_of = _gather_upper_ones(blob, upper_bit0, prev_pos, last_pos, counts)
    if len(pos) != len(idx) or not np.array_equal(
        np.bincount(run_of, minlength=len(counts)), counts
    ):
        raise ValueError(
            f"corrupt EF blob: upper-bit count mismatch in quanta {qidx[:8]}..."
        )
    high = pos - idx
    d = (high << np.int64(l)) | lower
    return (d, idx) if with_indices else d


def decode_strict_cps_quanta_multi(
    blob: bytes,
    m: int,
    upper_bound: int,
    qidx,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
):
    """Decode the CORRECTED prefix sums of all quanta in sorted-unique
    `qidx` of a strict EF list (forward-pointer family: freq blobs and
    position blobs), one vectorized pass. Returns (cps, prev_cps, idx,
    starts_cum, counts): concatenated run-major cps values, per-run
    entry prefix sums (cps of element a-1, 0 at list start), the global
    element index of each value, and run offsets/counts. Returns None
    when a run start is unreachable by pointer (tiny list) or the field
    width is pathological — caller falls back to whole-list decode."""
    qidx = np.asarray(qidx, dtype=np.int64)
    if len(qidx) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z
    q = 1 << log2_quantum
    l = lower_bits(m, upper_bound, True)
    psize = pointer_size(m, upper_bound, True, False)
    n_ptrs = number_of_pointers(m, upper_bound, log2_quantum, True, False)
    off = n_ptrs * psize
    upper_bit0 = off + m * l

    j0s, j1s, a, e, counts, starts_cum, idx = _runs_of(qidx, q, m)
    if len(counts) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z
    needs_ptr = a > 0
    if l > 57 or (needs_ptr.any() and (psize == 0 or int(j0s[needs_ptr].max()) > n_ptrs)):
        return None

    prev_pos = np.full(len(a), -1, dtype=np.int64)
    prev_cps = np.zeros(len(a), dtype=np.int64)
    if needs_ptr.any():
        ptrs = _read_fields_starts(blob, (j0s[needs_ptr] - 1) * psize, psize)
        pp = ptrs - 1
        prev_high = pp - (a[needs_ptr] - 1)
        prev_lower = _read_fields_starts(blob, off + (a[needs_ptr] - 1) * l, l)
        prev_pos[needs_ptr] = pp
        prev_cps[needs_ptr] = (prev_high << np.int64(l)) | prev_lower

    last_pos = np.empty(len(a), dtype=np.int64)
    pointed = j1s <= n_ptrs
    if pointed.any():
        last_pos[pointed] = (
            _read_fields_starts(blob, (j1s[pointed] - 1) * psize, psize) - 1
        )
    last_pos[~pointed] = len(blob) * 8 - upper_bit0 - 1  # tail: to blob end

    lower = _read_fields_starts(blob, off + idx * l, l)
    pos, run_of = _gather_upper_ones(blob, upper_bit0, prev_pos, last_pos, counts)
    if len(pos) != len(idx) or not np.array_equal(
        np.bincount(run_of, minlength=len(counts)), counts
    ):
        raise ValueError(
            f"corrupt EF blob: upper-bit count mismatch in quanta {qidx[:8]}..."
        )
    high = pos - idx
    cps = (high << np.int64(l)) | lower
    return cps, prev_cps, idx, starts_cum, counts


def decode_freqs_quanta_multi(
    blob: bytes,
    df: int,
    cf: int,
    qidx,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> np.ndarray:
    """Decode tf values of all quanta in sorted-unique `qidx` in one
    vectorized pass (concatenated, run-major ascending) — batched
    replacement for a per-run decode_freqs_quanta loop. Per-run entry
    prefix sums come from a single gather over the forward pointers."""
    qidx = np.asarray(qidx, dtype=np.int64)
    if len(qidx) == 0:
        return np.zeros(0, dtype=np.int64)
    out = decode_strict_cps_quanta_multi(blob, df, cf, qidx, log2_quantum)
    if out is None:  # tiny list / pathological width: whole-list fallback
        q = 1 << log2_quantum
        full = decode_freqs(blob, df, cf, log2_quantum)
        keep = np.zeros(df, dtype=bool)
        for j in qidx:
            keep[j * q : min((j + 1) * q, df)] = True
        return full[keep]
    cps, prev_cps, _, starts_cum, _ = out
    if len(cps) == 0:
        return np.zeros(0, dtype=np.int64)
    shifted = np.empty_like(cps)
    shifted[1:] = cps[:-1]
    shifted[starts_cum] = prev_cps
    return cps - shifted + 1


def decode_positions_ranges(
    blob: bytes,
    n_elems: int,
    upper_bound: int,
    ranges,
    log2_quantum: int = DEFAULT_LOG2_QUANTUM,
) -> list[np.ndarray]:
    """Decode positions for SELECTED postings only — the true lazy
    per-posting decode (EFBlockIterablePosting.getPositions reads one
    posting's segment on demand; here a batch of segments decodes in
    one vectorized pass). `ranges` is an (n, 2) array of [s, e) element
    ranges into the strict position sequence (one per wanted posting;
    s = cumulative tf before the posting, e = s + tf). Returns one
    position array per range.

    Derivation: raw prefix sum R_j = cps_j + j + 1 (strict correction),
    and within a posting pos_k = R_j - R_{s-1} - 1, so
    pos = cps_j - cps_{s-1} + (j - s) with cps_{-1} = 0."""
    ranges = np.asarray(ranges, dtype=np.int64).reshape(-1, 2)
    if len(ranges) == 0:
        return []
    # quanta covering every range plus its entry element s-1
    lo_q = np.maximum(ranges[:, 0] - 1, 0) >> log2_quantum
    hi_q = (np.maximum(ranges[:, 1], 1) - 1) >> log2_quantum  # inclusive
    qidx = np.unique(
        np.concatenate([np.arange(lo, hi + 1) for lo, hi in zip(lo_q, hi_q)])
    )
    out = decode_strict_cps_quanta_multi(
        blob, n_elems, upper_bound, qidx, log2_quantum
    )
    if out is None:  # tiny list / pathological width: whole-list cps
        cps = ef_decode_prefix_sums(
            blob, n_elems, upper_bound, strict=True, index_zeroes=False,
            log2_quantum=log2_quantum,
        )
        idx = np.arange(n_elems, dtype=np.int64)
    else:
        cps, _, idx, _, _ = out
    # fully vectorized assembly (no per-range Python in the hot path):
    # one searchsorted for every wanted element, one for every entry
    s_arr = ranges[:, 0]
    lens = np.maximum(ranges[:, 1] - s_arr, 0)
    total = int(lens.sum())
    if total == 0:
        return [np.zeros(0, dtype=np.int64) for _ in range(len(ranges))]
    off = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    all_js = (
        np.arange(total, dtype=np.int64)
        - np.repeat(off, lens)
        + np.repeat(s_arr, lens)
    )
    vals = cps[np.searchsorted(idx, all_js)]
    entry = np.where(
        s_arr == 0, 0, cps[np.searchsorted(idx, np.maximum(s_arr - 1, 0))]
    )
    flat = vals - np.repeat(entry, lens) + (all_js - np.repeat(s_arr, lens))
    return np.split(flat, np.cumsum(lens)[:-1])


# ---------------------------------------------------------------------------
# Skip semantics (next(target)) — pointer-driven, mirrors DocidReader.skipTo
# ---------------------------------------------------------------------------

class DocidCursor:
    """Decoded-view cursor over one docid blob exposing the reference's
    cursor API: next() and next(target) with 'smallest docid >= target'
    semantics and END_OF_LIST == -1 (EFBasicIterablePosting.java:146-178).

    The underlying access is a whole-list vectorized decode (the Spark
    engine scores whole lists); this class exists to make the semantics
    testable one-call-at-a-time like the reference's iterator tests.
    """

    END_OF_LIST = -1

    def __init__(self, blob: bytes, df: int, num_docs: int,
                 log2_quantum: int = DEFAULT_LOG2_QUANTUM):
        self.docids = decode_docids(blob, df, num_docs, log2_quantum)
        self.num_docs = num_docs
        self.idx = -1

    def next(self) -> int:
        self.idx += 1
        if self.idx >= len(self.docids):
            return self.END_OF_LIST
        return int(self.docids[self.idx])

    def next_geq(self, target: int) -> int:
        if target >= self.num_docs:
            self.idx = len(self.docids)
            return self.END_OF_LIST
        if 0 <= self.idx < len(self.docids) and self.docids[self.idx] >= target:
            return int(self.docids[self.idx])
        j = int(np.searchsorted(self.docids, target, side="left"))
        j = max(j, self.idx + 1)
        self.idx = j
        if j >= len(self.docids):
            return self.END_OF_LIST
        return int(self.docids[j])


# ---------------------------------------------------------------------------
# Gamma / unary codes (LongWordBitWriter.writeGamma / writeNonZeroGamma)
# ---------------------------------------------------------------------------

def write_gamma_array(values) -> bytes:
    """Gamma-code an int array (value >= 0 -> nonZeroGamma(value+1)).
    Used for the doc-length index artifact (EFDocumentIndex.java:106-112)."""
    v = np.asarray(values, dtype=np.int64) + 1
    if len(v) == 0:
        return _pack_blob([])
    if int(v.min()) < 1:
        raise ValueError("gamma code requires values >= 0")
    # exact integer msb per element (no float log)
    msbs = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.int64(1) << np.int64(shift))
        msbs[mask] += shift
        tmp[mask] >>= np.int64(shift)
    # whole-array layout (no per-value Python loop — this codec sits on
    # the finalize path for the doc-length artifact): each value owns
    # 2*msb+1 bits — msb zeros, a 1 terminator, then msb rest bits of
    # (v ^ (1 << msb)) LSB-first
    widths = 2 * msbs + 1
    starts = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(widths)[:-1]]
    )
    bits = np.zeros(int(widths.sum()), dtype=np.uint8)
    bits[starts + msbs] = 1
    rest = v ^ (np.int64(1) << msbs)
    for k in range(int(msbs.max())):
        m = msbs > k
        bits[starts[m] + msbs[m] + 1 + k] = (rest[m] >> np.int64(k)) & 1
    return _pack_blob([bits])


def read_gamma_array(blob: bytes, count: int) -> np.ndarray:
    """Decode `count` gamma-coded values (inverse of write_gamma_array)."""
    bits = _unpack_blob(blob)
    out = np.zeros(count, dtype=np.int64)
    pos = 0
    ones = np.flatnonzero(bits)
    ones_iter = 0
    for i in range(count):
        # find next set bit at/after pos -> msb
        while ones[ones_iter] < pos:
            ones_iter += 1
        b = int(ones[ones_iter]) - pos
        pos += b + 1
        rest = int(_bits_to_fields(bits[pos : pos + b], 1, b)[0]) if b else 0
        pos += b
        out[i] = ((1 << b) | rest) - 1
    return out


def bits_in_blob(blob: bytes) -> int:
    return len(blob) * 8
