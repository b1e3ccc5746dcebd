"""Terrier on-disk CONTAINER artifacts — the pieces a real Terrier 5
install needs to open an export without shims: the γ-coded `.sizes`
document-length stream (EFDocumentIndex.java:106-112), the Elias-Fano
direct (forward) index (DirectIndexWriter.java:43,74-94), the
FSOMapFile lexicon of fixed-size records (EFLexiconEntry.java:61-64,
FSOMapFileAppendLexiconOutputStream.java:40-46), and a
java.util.Properties `data.properties` twin (util/IndexUtil.java:56-96).

Byte/bit conventions differ per artifact, and being exact about each is
the whole point of this module:

- `.sizes` is written by dsi's OutputBitStream: MSB-first bits packed
  into bytes, γ(n) = unary(msb(n+1)) — msb zeros then a 1 — followed by
  the low msb bits of n+1, MSB-first.
- the direct EF streams use LongWordBitWriter like the inverted ones:
  LSB-first bits inside little-endian 64-bit words (export._pack_stream)
  with LOG2QUANTUM = 8 fixed (DirectIndexWriter.java:42).
- the `.direct.fsarrayfile` pointer records and every FSOMapFile record
  are java.io.DataOutput: big-endian ints/longs. The lexicon key is a
  Hadoop Text (vint length + UTF-8 bytes) zero-padded to
  FixedSizeTextFactory.getSize() = vint_size(3*maxchars) + 3*maxchars.

Everything here is driver-side BY DESIGN (a continuous bitstream is
single-writer) behind the same posting-count guard as export.py; the
100 TB path is per-term-partition export + export_merge_bitfiles, and
these container files are written once per merged artifact.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from terrier_ef_spark import ef
from terrier_ef_spark.index.export import (
    MAX_EXPORT_POSTINGS,
    _decode_at,
    _pack_stream,
    _read_lexicon,
    _unpack_stream,
)

DIRECT_LOG2QUANTUM = 8  # DirectIndexWriter.java:42, fixed by the format
DIRECT_ENTRY = struct.Struct(">qqi")  # termidsOffset, freqsOffset, size
JAVA_INT_MAX = 2**31 - 1
DEFAULT_MAX_TERM_LENGTH = 20  # ApplicationSetup.MAX_TERM_LENGTH default


# ---------------------------------------------------------------------------
# dsi OutputBitStream γ codec (MSB-first) — the .sizes stream
# ---------------------------------------------------------------------------

def gamma_msb_bits(values) -> np.ndarray:
    """γ-code an int array (n >= 0 -> γ(n+1)) in dsi OutputBitStream
    bit order: per value, msb zeros, a 1, then the low msb bits of n+1
    MSB-first. Vectorized whole-array (mirrors ef.write_gamma_array,
    which targets the LSB-first LongWordBitWriter convention instead)."""
    v = np.asarray(values, dtype=np.int64) + 1
    if len(v) == 0:
        return np.zeros(0, dtype=np.uint8)
    if int(v.min()) < 1:
        raise ValueError("gamma code requires values >= 0")
    msbs = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.int64(1) << np.int64(shift))
        msbs[mask] += shift
        tmp[mask] >>= np.int64(shift)
    widths = 2 * msbs + 1
    starts = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(widths)[:-1]]
    )
    bits = np.zeros(int(widths.sum()), dtype=np.uint8)
    bits[starts + msbs] = 1
    rest = v ^ (np.int64(1) << msbs)
    for k in range(int(msbs.max())):
        # bit k of the MSB-first field holds rest bit (msb-1-k)
        m = msbs > k
        bits[starts[m] + msbs[m] + 1 + k] = (
            rest[m] >> (msbs[m] - 1 - np.int64(k))
        ) & 1
    return bits


def read_gamma_msb(blob: bytes, count: int) -> np.ndarray:
    """Decode `count` γ values from an MSB-first byte stream — the
    InputBitStream.readGammas contract EFDocumentIndex relies on."""
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    out = np.zeros(count, dtype=np.int64)
    ones = np.flatnonzero(bits)
    pos = 0
    oi = 0
    for i in range(count):
        while ones[oi] < pos:
            oi += 1
        msb = int(ones[oi] - pos)
        val = 1
        for k in range(msb):
            val = (val << 1) | int(bits[pos + msb + 1 + k])
        out[i] = val - 1
        pos += 2 * msb + 1
    return out


def export_sizes(index, out_prefix: str) -> int:
    """Write `<out_prefix>.sizes`: one global γ bitstream of document
    lengths in docid order, 0..docid_bound-1 (EFDocumentIndex.write,
    EFDocumentIndex.java:106-112). Docid holes (tombstone-folded or
    merged-with-gaps indexes) emit length 0 — γ(1), one bit — so the
    positional read-by-docid contract holds. Returns the entry count."""
    from pyspark.sql import functions as F

    from terrier_ef_spark.index.builder import decode_bound

    bound = decode_bound(index.stats)
    max_docid = index.docs.agg(F.max("docid")).collect()[0][0]
    bound = max(bound, int(max_docid) + 1 if max_docid is not None else 0)
    rows = index.docs.select("docid", "doclen").toPandas()
    lens = np.zeros(bound, dtype=np.int64)
    lens[rows["docid"].to_numpy(np.int64)] = rows["doclen"].to_numpy(np.int64)
    with open(out_prefix + ".sizes", "wb") as fh:
        fh.write(np.packbits(gamma_msb_bits(lens)).tobytes())
    return bound


def read_sizes(out_prefix: str, num_docs: int) -> np.ndarray:
    """Read back `num_docs` γ-coded lengths (EFDocumentIndex.java:70-78)."""
    with open(out_prefix + ".sizes", "rb") as fh:
        return read_gamma_msb(fh.read(), num_docs)


# ---------------------------------------------------------------------------
# Hadoop / java.io serialization helpers — FSOMapFile lexicon
# ---------------------------------------------------------------------------

def _hadoop_vint(i: int) -> bytes:
    """Hadoop WritableUtils.writeVInt byte encoding."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    length = -112
    if i < 0:
        i ^= -1
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    out = [struct.pack("b", length)]
    n = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(n, 0, -1):
        out.append(struct.pack("B", (i >> ((idx - 1) * 8)) & 0xFF))
    return b"".join(out)


def _read_hadoop_vint(buf: bytes, off: int) -> tuple[int, int]:
    first = struct.unpack_from("b", buf, off)[0]
    if -112 <= first <= 127:
        return first, 1
    n = -(first + 120) if first < -120 else -(first + 112)
    val = 0
    for k in range(n):
        val = (val << 8) | buf[off + 1 + k]
    if first < -120:
        val ^= -1
    return val, 1 + n


def fixed_text_size(max_term_length: int) -> int:
    """FixedSizeTextFactory.getSize(): worst-case UTF-8 is 3 bytes per
    char, plus the Hadoop vint that prefixes a Text's byte length."""
    nbytes = 3 * max_term_length
    return len(_hadoop_vint(nbytes)) + nbytes


def _fixed_text(term: str, size: int) -> bytes:
    raw = term.encode("utf-8")
    rec = _hadoop_vint(len(raw)) + raw
    if len(rec) > size:
        raise ValueError(
            f"term {term!r} serializes to {len(rec)} bytes > fixed key "
            f"size {size}; raise max_term_length"
        )
    return rec + b"\0" * (size - len(rec))


def export_fsomapfile_lexicon(
    out_prefix: str,
    *,
    max_term_length: int = DEFAULT_MAX_TERM_LENGTH,
) -> dict:
    """Write `<out_prefix>.lexicon.fsomapfile` from the bridge's parquet
    lexicon: fixed-size records sorted by term, each a FixedSizeText key
    followed by a big-endian EFLexiconEntry value — termId, TF, n_t,
    maxtf ints then docidOffset, freqOffset longs (EFLexiconEntry.write,
    EFLexiconEntry.java:147-155; 32 bytes), plus a trailing posOffset
    long for positional indexes (EFBlockLexiconEntry.java:110-116; 40
    bytes). Terms longer than max_term_length chars raise — Terrier
    truncates at index time, this bridge refuses to corrupt keys, so
    pass the source pipeline's max_term_length (or the longest term).
    Returns {entries, key_size, value_size, max_term_length}."""
    lex = _read_lexicon(out_prefix)
    positions = "pos_bit_offset" in lex and any(
        int(o) >= 0 for o in lex["pos_bit_offset"]
    )
    key_size = fixed_text_size(max_term_length)
    value = struct.Struct(">iiiiqqq" if positions else ">iiiiqq")
    maxtfs = lex.get("maxtf") or [JAVA_INT_MAX] * len(lex["term"])
    order = np.argsort(np.asarray(lex["term"], dtype=object))
    with open(out_prefix + ".lexicon.fsomapfile", "wb") as fh:
        for i in map(int, order):
            fields = [
                int(lex["termid"][i]),
                int(lex["cf"][i]),       # TF = collection frequency
                int(lex["df"][i]),       # n_t = document frequency
                int(maxtfs[i]),
                int(lex["docid_bit_offset"][i]),
                int(lex["freq_bit_offset"][i]),
            ]
            if positions:
                fields.append(int(lex["pos_bit_offset"][i]))
            fh.write(_fixed_text(str(lex["term"][i]), key_size))
            fh.write(value.pack(*fields))
    return {
        "entries": len(lex["term"]),
        "key_size": key_size,
        "value_size": value.size,
        "max_term_length": max_term_length,
        "positions": positions,
    }


def read_fsomapfile_lexicon(
    out_prefix: str,
    *,
    max_term_length: int = DEFAULT_MAX_TERM_LENGTH,
    positions: bool = False,
) -> dict:
    """Parse the binary lexicon back (round-trip check surface)."""
    key_size = fixed_text_size(max_term_length)
    value = struct.Struct(">iiiiqqq" if positions else ">iiiiqq")
    entry_size = key_size + value.size
    out = {k: [] for k in (
        "term", "termid", "cf", "df", "maxtf",
        "docid_bit_offset", "freq_bit_offset", "pos_bit_offset",
    )}
    with open(out_prefix + ".lexicon.fsomapfile", "rb") as fh:
        buf = fh.read()
    if len(buf) % entry_size:
        raise ValueError(
            f"lexicon file size {len(buf)} is not a multiple of the "
            f"entry size {entry_size}"
        )
    for off in range(0, len(buf), entry_size):
        nbytes, consumed = _read_hadoop_vint(buf, off)
        term = buf[off + consumed:off + consumed + nbytes].decode("utf-8")
        vals = value.unpack_from(buf, off + key_size)
        out["term"].append(term)
        out["termid"].append(vals[0])
        out["cf"].append(vals[1])
        out["df"].append(vals[2])
        out["maxtf"].append(vals[3])
        out["docid_bit_offset"].append(vals[4])
        out["freq_bit_offset"].append(vals[5])
        out["pos_bit_offset"].append(vals[6] if positions else -1)
    return out


# ---------------------------------------------------------------------------
# Direct (forward) index — DirectIndexWriter layout
# ---------------------------------------------------------------------------

def export_direct_bitfiles(index, out_prefix: str) -> dict:
    """Write the forward index in the reference layout
    (DirectIndexWriter.java:74-94): per docid 0..bound-1 one 20-byte
    big-endian record in `<prefix>.direct.fsarrayfile` — the STARTING
    bit offsets of the doc's lists plus its posting count — and two EF
    bitstreams, `<prefix>.direct.docids` holding termid-gap sequences
    bounded by num_terms (init(size, upperBoundTermids, false, true),
    line 82: the inverted docids convention) and `<prefix>.direct.freqs`
    holding cumulative tf sequences bounded by the doc's length
    (init(size, doclen, true, false), line 83: the inverted freqs
    convention), both at the format's fixed LOG2QUANTUM = 8. Docid
    holes get size-0 records pointing at the current offsets, exactly
    what a zero-posting dump produces."""
    from terrier_ef_spark.index.builder import decode_bound
    from terrier_ef_spark.index.direct import build_direct, decode_direct

    num_postings = int(index.stats["num_postings"])
    if num_postings > MAX_EXPORT_POSTINGS:
        raise ValueError(
            f"direct export is a driver-side interop bridge, guarded to "
            f"{MAX_EXPORT_POSTINGS} postings (index has {num_postings})"
        )
    num_terms = int(index.stats["num_terms"])
    bound = decode_bound(index.stats)

    direct = build_direct(index)
    rows = (
        decode_direct(index, direct)
        .toPandas()
        .sort_values(["docid", "termid"])
    )
    doclens = index.docs.select("docid", "doclen").toPandas()
    dl = np.zeros(bound, dtype=np.int64)
    dl[doclens["docid"].to_numpy(np.int64)] = (
        doclens["doclen"].to_numpy(np.int64)
    )

    tid_bits: list[np.ndarray] = []
    tf_bits: list[np.ndarray] = []
    tid_off = 0
    tf_off = 0
    pointer_recs = []
    groups = dict(iter(rows.groupby("docid", sort=True)))
    for docid in range(bound):
        grp = groups.get(docid)
        n = 0 if grp is None else len(grp)
        pointer_recs.append(DIRECT_ENTRY.pack(tid_off, tf_off, n))
        if n == 0:
            continue
        tids = grp["termid"].to_numpy(np.int64)
        tfs = grp["tf"].to_numpy(np.int64)
        gaps = np.diff(tids, prepend=np.int64(0))
        tb = ef.ef_encode_bits(
            gaps, num_terms, strict=False, index_zeroes=True,
            log2_quantum=DIRECT_LOG2QUANTUM,
        )
        fb = ef.ef_encode_bits(
            tfs, int(dl[docid]), strict=True, index_zeroes=False,
            log2_quantum=DIRECT_LOG2QUANTUM,
        )
        tid_off += len(tb)
        tf_off += len(fb)
        tid_bits.append(tb)
        tf_bits.append(fb)

    with open(out_prefix + ".direct.fsarrayfile", "wb") as fh:
        fh.write(b"".join(pointer_recs))
    with open(out_prefix + ".direct.docids", "wb") as fh:
        fh.write(_pack_stream(tid_bits))
    with open(out_prefix + ".direct.freqs", "wb") as fh:
        fh.write(_pack_stream(tf_bits))
    return {
        "num_docs": bound,
        "num_terms": num_terms,
        "termids_bits": tid_off,
        "freqs_bits": tf_off,
        "log2_quantum": DIRECT_LOG2QUANTUM,
    }


def read_doc_from_direct_bitfiles(
    out_prefix: str, docid: int, *, num_terms: int, doclen: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one document's (termids, tfs) from the direct bitfiles —
    the EFDirectIndex cursor contract, random access by pointer record."""
    with open(out_prefix + ".direct.fsarrayfile", "rb") as fh:
        fh.seek(docid * DIRECT_ENTRY.size)
        tid_off, tf_off, n = DIRECT_ENTRY.unpack(fh.read(DIRECT_ENTRY.size))
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    t_stream = _unpack_stream(out_prefix, ".direct.docids")
    f_stream = _unpack_stream(out_prefix, ".direct.freqs")
    t_cps = _decode_at(
        t_stream, tid_off, n, num_terms,
        strict=False, index_zeroes=True, log2q=DIRECT_LOG2QUANTUM,
    )
    f_cps = _decode_at(
        f_stream, tf_off, n, doclen,
        strict=True, index_zeroes=False, log2q=DIRECT_LOG2QUANTUM,
    )
    tids = t_cps[:-1]
    tfs = np.diff(f_cps, prepend=np.int64(0)) + 1
    return tids, tfs


# ---------------------------------------------------------------------------
# java.util.Properties twin — IndexUtil.writeEFIndexProperties
# ---------------------------------------------------------------------------

def write_java_properties(
    out_prefix: str,
    *,
    num_docs: int,
    num_terms: int,
    num_pointers: int,
    num_tokens: int,
    log2_quantum: int,
    positions: bool,
    max_term_length: int = DEFAULT_MAX_TERM_LENGTH,
    has_direct: bool = False,
) -> str:
    """Write `<out_prefix>.properties` in java.util.Properties format
    with the keys the reference declares (util/IndexUtil.java:56-96 and
    the positional twin at 98-140; direct registration per
    Invert2Direct.java:250-255), so Terrier's IndexOnDisk.createIndex
    resolves every structure class from the file alone."""
    value_factory = (
        "it.cnr.isti.hpclab.ef.structures.EFBlockLexiconEntry$Factory"
        if positions
        else "it.cnr.isti.hpclab.ef.structures.EFLexiconEntry$Factory"
    )
    lines = [
        ("index.terrier.version", "5.0"),
        ("num.Documents", str(num_docs)),
        ("num.Terms", str(num_terms)),
        ("num.Pointers", str(num_pointers)),
        ("num.Tokens", str(num_tokens)),
        ("log2Quantum", str(log2_quantum)),  # EliasFano.LOG2QUANTUM
        ("ByteOrder", "LITTLE_ENDIAN"),      # EliasFano.BYTEORDER
        ("max.term.length", str(max_term_length)),
        ("index.lexicon.termids", "aligned"),
        ("index.lexicon.bsearchshortcut", "default"),
        ("index.lexicon.class", "org.terrier.structures.FSOMapFileLexicon"),
        ("index.lexicon.parameter_types",
         "java.lang.String,org.terrier.structures.IndexOnDisk"),
        ("index.lexicon.parameter_values", "structureName,index"),
        ("index.lexicon-keyfactory.class",
         "org.terrier.structures.seralization.FixedSizeTextFactory"),
        ("index.lexicon-keyfactory.parameter_types", "java.lang.String"),
        ("index.lexicon-keyfactory.parameter_values", "${max.term.length}"),
        ("index.lexicon-valuefactory.class", value_factory),
        ("index.lexicon-valuefactory.parameter_values", ""),
        ("index.lexicon-valuefactory.parameter_types", ""),
        ("index.document.class",
         "it.cnr.isti.hpclab.ef.structures.EFDocumentIndex"),
        ("index.document.parameter_types",
         "org.terrier.structures.IndexOnDisk"),
        ("index.document.parameter_values", "index"),
        ("index.inverted.class",
         "it.cnr.isti.hpclab.ef.structures.EFInvertedIndex"),
        ("index.inverted.parameter_types",
         "org.terrier.structures.IndexOnDisk,org.terrier.structures.DocumentIndex"),
        ("index.inverted.parameter_values", "index,document"),
    ]
    if positions:
        lines.insert(7, ("hasPositions", "true"))  # EliasFano.HAS_POSITIONS
    if has_direct:
        lines.extend([
            ("index.direct.class",
             "it.cnr.isti.hpclab.ef.structures.EFDirectIndex"),
            ("index.direct.parameter_types",
             "org.terrier.structures.IndexOnDisk"),
            ("index.direct.parameter_values", "index"),
        ])
    path = out_prefix + ".properties"
    with open(path, "w") as fh:
        for k, v in lines:
            fh.write(f"{_prop_escape(k)}={_prop_escape(v)}\n")
    return path


def _prop_escape(s: str) -> str:
    """java.util.Properties key/value escaping for the chars we emit."""
    return s.replace("\\", "\\\\").replace(":", "\\:").replace("=", "\\=")


def read_java_properties(path: str) -> dict:
    props = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            for i, ch in enumerate(line):
                if ch in "=:" and (i == 0 or line[i - 1] != "\\"):
                    key, val = line[:i], line[i + 1:]
                    break
            else:
                key, val = line, ""
            props[key.replace("\\:", ":").replace("\\=", "=")] = (
                val.replace("\\:", ":").replace("\\=", "=")
            )
    return props


def export_terrier_container(
    index,
    out_prefix: str,
    *,
    include_direct: bool = True,
    max_term_length: int | None = None,
) -> dict:
    """One-call full-container export: the bitfile bridge
    (export_terrier_bitfiles: .docids/.freqs/.positions + parquet
    lexicon + properties.json) PLUS the Terrier container artifacts —
    .sizes, .lexicon.fsomapfile, .properties, and (optionally) the
    three direct-index files. Returns the merged properties dict."""
    from terrier_ef_spark.index.export import export_terrier_bitfiles

    props = export_terrier_bitfiles(index, out_prefix)
    sizes_n = export_sizes(index, out_prefix)
    if max_term_length is None:
        recorded = None
        try:
            with open(os.path.join(index.paths.root, "params.json")) as fh:
                recorded = json.load(fh).get("max_term_length")
        except FileNotFoundError:
            pass
        longest = max(
            (len(t) for t in _read_lexicon(out_prefix)["term"]), default=0
        )
        max_term_length = max(
            DEFAULT_MAX_TERM_LENGTH, int(recorded or 0), longest
        )
    lexinfo = export_fsomapfile_lexicon(
        out_prefix, max_term_length=max_term_length
    )
    direct_info = None
    if include_direct:
        direct_info = export_direct_bitfiles(index, out_prefix)
    write_java_properties(
        out_prefix,
        num_docs=sizes_n,
        num_terms=int(props["num_terms"]),
        num_pointers=int(props["num_postings"]),
        num_tokens=int(index.stats.get("num_tokens") or 0),
        log2_quantum=int(props["log2_quantum"]),
        positions=bool(props["positions"]),
        max_term_length=max_term_length,
        has_direct=include_direct,
    )
    props.update({
        "sizes_entries": sizes_n,
        "lexicon_fsomapfile": lexinfo,
        "direct": direct_info,
        "max_term_length": max_term_length,
    })
    with open(out_prefix + ".properties.json", "w") as fh:
        json.dump(props, fh, indent=2)
    return props
