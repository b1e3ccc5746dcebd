"""Terrier-layout interop bridge: export the Parquet EF index to the
reference's on-disk shape — global `.docids` / `.freqs` bitfiles with
per-term BIT offsets in a lexicon — and import it back.

Reference layout being reproduced (studied, not copied):
- EliasFanoWriters.java:32-48 — one LongWordBitWriter per bitfile;
  every term's EF sequence is appended to a single continuous bitstream
  (no per-term word alignment; only the file tail pads to a 64-bit
  word), and the lexicon entry records the sequence's bit offset.
- CompressorReducer.java:101-109 — merging two partial indexes is file
  concatenation plus `offset += 8 * bytes(file1)` on every second-file
  lexicon entry. export_merge_bitfiles below reproduces exactly that
  math, making it the on-disk inverse of index/merge.py's docid-relabel
  merge.

Scope (deliberate, see COVERAGE.md): this is an interop proof and the
strongest available bit-level differential surface for the EF kernel —
the product artifact at 100 TB stays the partitioned Parquet blobs.
The export is driver-side and guarded to small indexes (a single
continuous bitstream is single-writer by definition — the same reason
the reference's own final reduce is sequential). The lexicon is written
as Parquet (term, termid, df, cf, maxtf, bit offsets) — the queryable
twin — and ALSO as Terrier's binary FSOMapFile container together with
the γ `.sizes` stream, the direct-index files, and a java Properties
file, via export_container.py (struct.pack, no Terrier jars needed).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.reader import EFIndex

MAX_EXPORT_POSTINGS = 5_000_000

LEX_SCHEMA = (
    "term string, termid long, df long, cf long, "
    "docid_bit_offset long, freq_bit_offset long, "
    "pos_bit_offset long, sum_max_pos long"  # -1 when non-positional
)


def _pack_stream(bit_arrays: list[np.ndarray]) -> bytes:
    """Concatenate per-term bit arrays into one continuous stream and
    pack LSB-first into little-endian bytes padded to a 64-bit word —
    the LongWordBitWriter file discipline (pad at file tail only)."""
    bits = (
        np.concatenate(bit_arrays)
        if bit_arrays
        else np.zeros(0, dtype=np.uint8)
    )
    packed = np.packbits(bits, bitorder="little")
    pad = (-len(packed)) % 8
    if pad:
        packed = np.concatenate([packed, np.zeros(pad, dtype=np.uint8)])
    return packed.tobytes()


def _read_lexicon(prefix: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = prefix + ".lexicon.parquet"
    files = [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pydict()


def _write_lexicon(prefix: str, columns: dict) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = prefix + ".lexicon.parquet"
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table(columns), os.path.join(out_dir, "part-0.parquet"))
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass


def _unpack_stream(prefix: str, ext: str) -> np.ndarray:
    with open(prefix + ext, "rb") as fh:
        return np.unpackbits(
            np.frombuffer(fh.read(), dtype=np.uint8), bitorder="little"
        )


def _gamma_bits(value: int) -> np.ndarray:
    """Raw bits of writeGamma(value) == nonZeroGamma(value + 1)
    (LongWordBitWriter.java:153-169): msb zeros, a 1, then msb rest
    bits LSB-first."""
    v = value + 1
    b = v.bit_length() - 1
    bits = np.zeros(2 * b + 1, dtype=np.uint8)
    bits[b] = 1
    rest = v ^ (1 << b)
    for kk in range(b):
        bits[b + 1 + kk] = (rest >> kk) & 1
    return bits


def _nonzero_gamma_bits(value: int) -> np.ndarray:
    """Raw bits of writeNonZeroGamma(value), value >= 1."""
    return _gamma_bits(value - 1)


def _read_gamma(stream: np.ndarray, off: int) -> tuple[int, int]:
    """Parse one γ code at bit `off`; returns (writeGamma value, nbits)."""
    b = 0
    while stream[off + b] == 0:
        b += 1
    v = 1 << b
    for kk in range(b):
        v |= int(stream[off + b + 1 + kk]) << kk
    return v - 1, 2 * b + 1


def export_terrier_bitfiles(
    index: EFIndex,
    out_prefix: str,
    *,
    terms: list[str] | None = None,
) -> dict:
    """Write `<out_prefix>.docids`, `<out_prefix>.freqs`,
    `<out_prefix>.lexicon.parquet` and `<out_prefix>.properties.json`
    in the reference's global-bitstream layout. Returns the properties
    dict. `terms` restricts the export to a term subset — a term
    PARTITION in the reference's compressor sense, mergeable back with
    export_merge_bitfiles when partitions are term-range-disjoint.

    Works for blocked and unblocked indexes alike: postings are decoded
    to absolute docids and re-encoded per term at the GLOBAL docid
    bound — the blockwise-to-global transformation the reference never
    needs (its blobs are global already) and our Parquet layout undoes
    block by block."""
    from terrier_ef_spark.query.engine import decode_postings

    num_postings = int(index.stats["num_postings"])
    if num_postings > MAX_EXPORT_POSTINGS:
        raise ValueError(
            f"export is a driver-side interop bridge, guarded to "
            f"{MAX_EXPORT_POSTINGS} postings (index has {num_postings}); "
            "export term partitions separately and combine with "
            "export_merge_bitfiles"
        )
    num_docs = int(index.stats["num_docs"])
    log2q = int(index.stats["log2_quantum"])

    positions = bool(index.stats.get("has_positions"))
    rows = (
        decode_postings(index, terms=sorted(terms) if terms else None)
        .select("term", "docid", "tf")
        .toPandas()
        .sort_values(["term", "docid"])
    )
    # docid-sequence upper bound: compacted/merged indexes keep their
    # original docids (gaps are free in the Parquet layout), so the max
    # docid can EXCEED num_docs — the dense-docid assumption the
    # reference gets for free. The bound is recorded in properties and
    # used symmetrically by every decode path. Derived from the whole
    # docs table (not the exported rows) so term-partition exports of
    # the same index share one bound and stay byte-merge-compatible.
    max_docid = index.docs.agg(F.max("docid")).collect()[0][0]
    docid_bound = max(num_docs, int(max_docid) + 1 if max_docid is not None else 0)
    pos_by_term: dict = {}
    if positions:
        from terrier_ef_spark.query.engine import decode_positions_df

        pdf = (
            decode_positions_df(index, sorted(terms) if terms else None)
            .toPandas()
            .sort_values(["term", "docid", "pos"])
        )
        for term, g in pdf.groupby("term", sort=True):
            pos_by_term[term] = {
                int(docid): gg["pos"].to_numpy(np.int64)
                for docid, gg in g.groupby("docid", sort=True)
            }
    docid_bits: list[np.ndarray] = []
    freq_bits: list[np.ndarray] = []
    pos_bits: list[np.ndarray] = []
    lex = {k: [] for k in (
        "term", "termid", "df", "cf", "maxtf",
        "docid_bit_offset", "freq_bit_offset",
        "pos_bit_offset", "sum_max_pos",
    )}
    docid_off = 0
    freq_off = 0
    pos_off = 0
    for termid, (term, grp) in enumerate(rows.groupby("term", sort=True)):
        d = grp["docid"].to_numpy(np.int64)
        tfs = grp["tf"].to_numpy(np.int64)
        cf = int(tfs.sum())
        gaps = np.diff(d, prepend=np.int64(0))
        db = ef.ef_encode_bits(
            gaps, docid_bound, strict=False, index_zeroes=True,
            log2_quantum=log2q,
        )
        fb = ef.ef_encode_bits(
            tfs, cf, strict=True, index_zeroes=False, log2_quantum=log2q
        )
        lex["term"].append(term)
        lex["termid"].append(termid)
        lex["df"].append(int(len(d)))
        lex["cf"].append(cf)
        lex["maxtf"].append(int(tfs.max()))
        lex["docid_bit_offset"].append(docid_off)
        lex["freq_bit_offset"].append(freq_off)
        docid_off += len(db)
        freq_off += len(fb)
        docid_bits.append(db)
        freq_bits.append(fb)
        if positions:
            # positions list layout (EliasFanoBlockEncoders.java:75-89):
            # a γ(lowerBits) header, then nonZeroγ(pointerSize) when the
            # list carries forward pointers, then the strict EF payload
            # of per-posting [1+pos0, deltas...] at ub = df + sumMaxPos
            # — the header makes the list self-describing to a reader
            # that knows only cf
            plists = [pos_by_term[term][int(docid)] for docid in d]
            smp = int(sum(int(p[-1]) for p in plists))
            ub = int(len(d)) + smp
            vals = np.concatenate([
                np.diff(p, prepend=np.int64(-1)) for p in plists
            ])
            l = ef.lower_bits(cf, ub, True)
            psize = ef.pointer_size(cf, ub, True, False)
            n_ptrs = ef.number_of_pointers(cf, ub, log2q, True, False)
            seg = [_gamma_bits(l)]
            if n_ptrs > 0:
                seg.append(_nonzero_gamma_bits(psize))
            seg.append(ef.ef_encode_bits(
                vals, ub, strict=True, index_zeroes=False,
                log2_quantum=log2q,
            ))
            pb = np.concatenate(seg)
            lex["pos_bit_offset"].append(pos_off)
            lex["sum_max_pos"].append(smp)
            pos_off += len(pb)
            pos_bits.append(pb)
        else:
            lex["pos_bit_offset"].append(-1)
            lex["sum_max_pos"].append(-1)

    with open(out_prefix + ".docids", "wb") as fh:
        fh.write(_pack_stream(docid_bits))
    with open(out_prefix + ".freqs", "wb") as fh:
        fh.write(_pack_stream(freq_bits))
    if positions:
        with open(out_prefix + ".positions", "wb") as fh:
            fh.write(_pack_stream(pos_bits))
    _write_lexicon(out_prefix, lex)
    props = {
        "num_docs": num_docs,
        "docid_bound": docid_bound,
        "num_terms": len(lex["term"]),
        "num_postings": int(sum(lex["df"])),
        "log2_quantum": log2q,
        "docids_bits": docid_off,
        "freqs_bits": freq_off,
        "positions": positions,
        "positions_bits": pos_off if positions else 0,
        "byte_order": "little",
        "layout": "terrier-ef-global-bitstream",
        # tuned scoring defaults ride the export so index_from_bitfiles
        # restores the same default ranking (round-4 verdict: lifecycle
        # paths must never silently reset k1/b)
        "k1": float(index.stats.get("k1", 1.2)),
        "b": float(index.stats.get("b", 0.75)),
    }
    with open(out_prefix + ".properties.json", "w") as fh:
        json.dump(props, fh, indent=2)
    return props


def export_merge_bitfiles(prefix_a: str, prefix_b: str, out_prefix: str) -> dict:
    """The reference's partial-index merge (CompressorReducer.java:
    101-109) on exported bitfiles: concatenate the streams at the BYTE
    boundary and add `8 * bytes(file_a)` (Byte.SIZE * Files.size) to
    every b-side lexicon offset. Requires term-range-disjoint inputs in
    sorted order (every a-side term < every b-side term) — the shape
    the reference's term-partitioned compressor produces."""
    props = {}
    for p in (prefix_a, prefix_b):
        with open(p + ".properties.json") as fh:
            props[p] = json.load(fh)
    if props[prefix_a]["num_docs"] != props[prefix_b]["num_docs"]:
        raise ValueError("bitfile merge requires the same docid space")
    if props[prefix_a].get("docid_bound") != props[prefix_b].get("docid_bound"):
        raise ValueError(
            "bitfile merge requires the same docid encode bound "
            "(partitions must be exported from the same index)"
        )
    if props[prefix_a]["log2_quantum"] != props[prefix_b]["log2_quantum"]:
        raise ValueError("bitfile merge requires the same log2_quantum")

    positional = bool(props[prefix_a].get("positions"))
    if positional != bool(props[prefix_b].get("positions")):
        raise ValueError("bitfile merge requires both or neither positional")
    exts = (".docids", ".freqs") + ((".positions",) if positional else ())
    rebase_bits = {}
    for ext in exts:
        with open(prefix_a + ext, "rb") as fh:
            a_bytes = fh.read()
        with open(prefix_b + ext, "rb") as fh:
            b_bytes = fh.read()
        rebase_bits[ext] = 8 * len(a_bytes)
        with open(out_prefix + ext, "wb") as fh:
            fh.write(a_bytes + b_bytes)

    la = _read_lexicon(prefix_a)
    lb = _read_lexicon(prefix_b)
    if la["term"] and lb["term"] and max(la["term"]) >= min(lb["term"]):
        raise ValueError(
            "bitfile merge requires term-partitioned inputs "
            "(every a-side term < every b-side term)"
        )
    n_a = len(la["term"])
    merged = {
        "term": la["term"] + lb["term"],
        "termid": la["termid"] + [t + n_a for t in lb["termid"]],
        "df": la["df"] + lb["df"],
        "cf": la["cf"] + lb["cf"],
        "maxtf": (
            (la.get("maxtf") or [2**31 - 1] * n_a)
            + (lb.get("maxtf") or [2**31 - 1] * len(lb["term"]))
        ),
        "docid_bit_offset": la["docid_bit_offset"]
        + [o + rebase_bits[".docids"] for o in lb["docid_bit_offset"]],
        "freq_bit_offset": la["freq_bit_offset"]
        + [o + rebase_bits[".freqs"] for o in lb["freq_bit_offset"]],
        "pos_bit_offset": (
            la["pos_bit_offset"]
            + [o + rebase_bits[".positions"] for o in lb["pos_bit_offset"]]
            if positional
            else la["pos_bit_offset"] + lb["pos_bit_offset"]
        ),
        "sum_max_pos": la["sum_max_pos"] + lb["sum_max_pos"],
    }
    _write_lexicon(out_prefix, merged)
    out_props = {
        **props[prefix_a],
        "num_terms": len(merged["term"]),
        "num_postings": props[prefix_a]["num_postings"]
        + props[prefix_b]["num_postings"],
        "docids_bits": rebase_bits[".docids"] + props[prefix_b]["docids_bits"],
        "freqs_bits": rebase_bits[".freqs"] + props[prefix_b]["freqs_bits"],
        "positions_bits": (
            rebase_bits[".positions"] + props[prefix_b]["positions_bits"]
            if positional else 0
        ),
    }
    with open(out_prefix + ".properties.json", "w") as fh:
        json.dump(out_props, fh, indent=2)
    # container artifacts ride the merge when the inputs carry them:
    # both partitions share one docid space (asserted above), so either
    # side's .sizes stream IS the merged one; the binary lexicon and
    # java properties re-derive from the merged parquet lexicon
    if os.path.exists(prefix_a + ".sizes"):
        from terrier_ef_spark.index import export_container as _ec

        with open(prefix_a + ".sizes", "rb") as fh:
            sizes = fh.read()
        with open(out_prefix + ".sizes", "wb") as fh:
            fh.write(sizes)
        mtl = max(
            int(props[prefix_a].get("max_term_length") or 0),
            int(props[prefix_b].get("max_term_length") or 0),
            max((len(t) for t in merged["term"]), default=0),
            _ec.DEFAULT_MAX_TERM_LENGTH,
        )
        _ec.export_fsomapfile_lexicon(out_prefix, max_term_length=mtl)
        _ec.write_java_properties(
            out_prefix,
            num_docs=int(out_props.get(
                "docid_bound", out_props["num_docs"]
            )),
            num_terms=len(merged["term"]),
            num_pointers=int(out_props["num_postings"]),
            num_tokens=int(sum(merged["cf"])),
            log2_quantum=int(out_props["log2_quantum"]),
            positions=positional,
            max_term_length=mtl,
        )
        out_props["max_term_length"] = mtl
        with open(out_prefix + ".properties.json", "w") as fh:
            json.dump(out_props, fh, indent=2)
    return out_props


def _decode_at(
    stream: np.ndarray, off: int, n: int, ub: int,
    *, strict: bool, index_zeroes: bool, log2q: int,
) -> np.ndarray:
    """Decode one EF sequence starting at bit `off` of an unpacked
    stream (decode reads exactly the sequence's bits; trailing stream
    content is ignored)."""
    blob = ef._pack_blob([stream[off:]])
    return ef.ef_decode_prefix_sums(
        blob, n, ub, strict=strict, index_zeroes=index_zeroes,
        log2_quantum=log2q,
    )


def read_term_from_bitfiles(
    prefix: str, term: str, *, with_positions: bool = False
):
    """Decode one term's (docids, tfs[, positions]) straight from the
    exported bitfiles via its lexicon bit offsets — the random-access
    import direction, and the proof the offsets are right. Positions
    parse the reference's self-describing list header (γ lowerBits,
    nonZeroγ pointerSize) and ASSERT it against the values derived from
    the stored sum_max_pos — a per-read fidelity check of the layout."""
    lex = _read_lexicon(prefix)
    try:
        i = lex["term"].index(term)
    except ValueError:
        raise KeyError(term) from None
    with open(prefix + ".properties.json") as fh:
        props = json.load(fh)
    df, cf = int(lex["df"][i]), int(lex["cf"][i])
    log2q = int(props["log2_quantum"])
    d_cps = _decode_at(
        _unpack_stream(prefix, ".docids"), int(lex["docid_bit_offset"][i]),
        df, int(props.get("docid_bound", props["num_docs"])),
        strict=False, index_zeroes=True, log2q=log2q,
    )
    f_cps = _decode_at(
        _unpack_stream(prefix, ".freqs"), int(lex["freq_bit_offset"][i]),
        df, cf, strict=True, index_zeroes=False, log2q=log2q,
    )
    docids = d_cps[:-1]
    tfs = np.diff(f_cps, prepend=np.int64(0)) + 1
    if not with_positions:
        return docids, tfs
    if not props.get("positions"):
        raise ValueError("export carries no positions stream")
    stream = _unpack_stream(prefix, ".positions")
    off = int(lex["pos_bit_offset"][i])
    smp = int(lex["sum_max_pos"][i])
    ub = df + smp
    l, nb = _read_gamma(stream, off)
    off += nb
    if l != ef.lower_bits(cf, ub, True):
        raise ValueError(
            f"corrupt positions stream: header lowerBits {l} != "
            f"expected {ef.lower_bits(cf, ub, True)}"
        )
    if ef.number_of_pointers(cf, ub, log2q, True, False) > 0:
        psize, nb = _read_gamma(stream, off)
        psize += 1  # nonZeroGamma
        off += nb
        if psize != ef.pointer_size(cf, ub, True, False):
            raise ValueError(
                f"corrupt positions stream: header pointerSize {psize} "
                f"!= expected {ef.pointer_size(cf, ub, True, False)}"
            )
    blob = ef._pack_blob([stream[off:]])
    plists = ef.decode_positions(blob, tfs, df, smp, log2q)
    return docids, tfs, plists


def import_terrier_bitfiles(spark, prefix: str):
    """Decode the full exported index back to (term, docid, tf) rows —
    the exhaustive round-trip surface, and the migration path for a
    user arriving WITH existing Terrier-layout bitfiles."""
    import pandas as pd

    lex = _read_lexicon(prefix)
    with open(prefix + ".properties.json") as fh:
        props = json.load(fh)
    log2q = int(props["log2_quantum"])
    d_stream = _unpack_stream(prefix, ".docids")
    f_stream = _unpack_stream(prefix, ".freqs")
    recs = {"term": [], "docid": [], "tf": []}
    for i, term in enumerate(lex["term"]):
        df, cf = int(lex["df"][i]), int(lex["cf"][i])
        d_cps = _decode_at(
            d_stream, int(lex["docid_bit_offset"][i]), df,
            int(props.get("docid_bound", props["num_docs"])),
            strict=False, index_zeroes=True, log2q=log2q,
        )
        f_cps = _decode_at(
            f_stream, int(lex["freq_bit_offset"][i]), df, cf,
            strict=True, index_zeroes=False, log2q=log2q,
        )
        recs["term"].append(np.repeat(term, df))
        recs["docid"].append(d_cps[:-1])
        recs["tf"].append(np.diff(f_cps, prepend=np.int64(0)) + 1)
    pdf = pd.DataFrame(
        {
            "term": np.concatenate(recs["term"]) if recs["term"] else [],
            "docid": np.concatenate(recs["docid"]) if recs["docid"] else [],
            "tf": np.concatenate(recs["tf"]) if recs["tf"] else [],
        }
    )
    return spark.createDataFrame(pdf.astype({"docid": "int64", "tf": "int64"}))


def index_from_bitfiles(
    spark,
    prefix: str,
    out_dir: str,
    *,
    block_bits: int | None = 16,
    n_partitions: int = 8,
) -> "EFIndex":
    """The full migration path for a user arriving WITH Terrier-layout
    bitfiles: decode the exported streams back to posting rows and
    rebuild a complete queryable Parquet EF index (postings, lexicon,
    docs, stats, doclens_gamma) via the standard encode + finalize
    pipeline. Doc lengths are reconstructed exactly as sum(tf) over a
    doc's terms — the identity the source index's doclens satisfy by
    construction (every surviving token is indexed once). docno is
    synthesized (`imported:<docid>`) and sha256 left empty: the
    bitfiles carry neither, which is a property of the source format,
    not of this bridge."""
    from terrier_ef_spark.index.builder import (
        FORMAT_VERSION,
        IndexPaths,
        encode_rows,
        finalize_index,
    )
    from terrier_ef_spark.index.reader import EFIndex

    with open(prefix + ".properties.json") as fh:
        props = json.load(fh)
    num_docs = int(props.get("docid_bound", props["num_docs"]))
    log2q = int(props["log2_quantum"])

    rows = import_terrier_bitfiles(spark, prefix)
    if os.path.exists(prefix + ".sizes"):
        # the container export carries the exact doc lengths
        # (EFDocumentIndex .sizes stream) — authoritative over the
        # sum-of-tf identity, which understates doclen for term-pruned
        # sources (prune keeps the original lengths for scoring)
        import pandas as pd

        from terrier_ef_spark.index.export_container import read_sizes

        lens = read_sizes(prefix, num_docs)
        nz = np.flatnonzero(lens)
        doclens = spark.createDataFrame(
            pd.DataFrame({"docid": nz.astype("int64"),
                          "doclen": lens[nz].astype("int64")})
        )
    else:
        doclens = rows.groupBy("docid").agg(F.sum("tf").alias("doclen"))
    kept = rows.join(doclens, "docid")

    po = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(po.params, "w") as fh:
        json.dump(
            {
                "format": FORMAT_VERSION,
                "log2_quantum": log2q,
                "positions": False,
                "block_bits": block_bits,
                "n_partitions": n_partitions,
                "tokenizer": "imported",
                "stopwords": None,
                "max_term_length": None,
                "imported_from": prefix,
            },
            fh,
        )
    encoded = encode_rows(
        kept.select("term", "docid", "tf", "doclen"),
        num_docs, log2q, block_bits, positions=False,
    )
    (encoded.repartitionByRange(n_partitions, "term", "block_id")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite").parquet(po.postings))
    (doclens.select(
        "docid",
        F.concat(F.lit("imported:"), F.col("docid").cast("string"))
        .alias("docno"),
        F.col("doclen").cast("long").alias("doclen"),
        F.lit("").alias("sha256"),
     )
     .repartitionByRange(n_partitions, "docid")
     .sortWithinPartitions("docid")
     .write.mode("overwrite").parquet(po.docs))
    finalize_index(
        spark, po,
        log2_quantum=log2q, positions=False, block_bits=block_bits,
        n_partitions=n_partitions, resume=False,
        k1=float(props.get("k1", 1.2)), b=float(props.get("b", 0.75)),
    )
    with open(po.manifest, "w") as fh:
        json.dump({"op": "import_bitfiles", "source": prefix}, fh)
    return EFIndex(spark, out_dir)
