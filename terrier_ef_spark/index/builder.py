"""Index build pipeline — the Spark-first re-expression of terrier-ef's
Generator pipeline (Generator.java:149-247).

Reference dataflow (partition terms -> parallel EF-encode -> ordered
byte-merge -> finalize) becomes:

    corpus --tokenize--> posting rows (term, docid, tf[, positions])
           --groupBy(term, block)--> applyInPandas EF-encode
           --> postings parquet (one self-contained EF blob set per
               term-block; per-blob offsets replace the reference's
               global bitfile offsets, so the ordered merge
               CompressorReducer.java:58-151 disappears entirely)

Skew/scale design (BASELINE.json north_rule):
- hot terms are *deterministically* salted by docid range: block_id =
  docid >> block_bits caps every encode group at the number of docs per
  block, independent of term df (cf. TermPartition.java:52-59 which
  partitions by termid only and cannot split one hot term);
- each stage is checkpointed to parquet with _SUCCESS markers and is
  skipped on resume (the north_rule 'resumable mid-build' requirement);
- per-bucket lineage metrics incl. bits/posting are written alongside
  the index (role of Generator.writeProperties, Generator.java:249-325).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_ef_spark import ef
from terrier_ef_spark.index.ids import assign_dense_ids
from terrier_ef_spark.tokenizer import make_tokenizer

K1 = 1.2
B = 0.75

# Postings format version; bumped when the blob or metadata layout
# changes so the params.json resume guard invalidates stale stages.
FORMAT_VERSION = 2

POSTINGS_SCHEMA = (
    "term string, block_id long, df int, cf long, maxtf int,"
    " first_docid long, last_docid long,"
    " docids_ef binary, freqs_ef binary,"
    " positions_ef binary, sum_max_pos long,"
    " q_last_docid array<long>, q_max_tf array<long>, q_min_dl array<long>"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def lexicon(self) -> str:
        return os.path.join(self.root, "lexicon")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def metrics(self) -> str:
        return os.path.join(self.root, "metrics")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    @property
    def params(self) -> str:
        return os.path.join(self.root, "params.json")


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _invalidate_stages(paths: IndexPaths) -> None:
    """Remove every stage _SUCCESS marker (and the direct index, which
    derives from postings) so a later crash-and-rerun can never resume a
    stage produced under different params. Must happen BEFORE the new
    params.json is written: otherwise the window between writing params
    and overwriting a stage would let a rerun see matching params plus a
    stale marker and silently reuse blobs encoded with the old params."""
    for stage in (paths.docs, paths.postings, paths.lexicon, paths.metrics):
        marker = os.path.join(stage, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
    direct_marker = os.path.join(paths.root, "direct", "_SUCCESS")
    if os.path.exists(direct_marker):
        os.remove(direct_marker)


def _check_resume(paths: IndexPaths, params: dict, resume: bool) -> bool:
    """A stage marker is only trustworthy if it was produced by a build
    with identical parameters — params.json is written before any stage
    and compared on resume (the manifest alone can't be used: it is only
    written at the end, so a mid-build crash leaves stages without it)."""
    if os.path.exists(paths.params):
        with open(paths.params) as fh:
            if json.load(fh) == params:
                return resume
        _invalidate_stages(paths)
    with open(paths.params, "w") as fh:
        json.dump(params, fh)
    return False


def block_upper_bound(block_bits: int | None, num_docs: int, block_id: int = 0) -> int:
    """Docid-sequence upper bound of one encode block. Blocked blobs are
    bounded by the block width alone — NOT by num_docs — so a blob's
    encoding never depends on global collection stats; this is what
    makes incremental (streaming) appends produce byte-identical blobs
    to a batch rebuild."""
    return num_docs if block_bits is None else (1 << block_bits)


def decode_bound(stats: dict) -> int:
    """The docid upper bound the index's blobs were ENCODED with. Equal
    to num_docs except when a lifecycle verb shrank the live set AFTER
    encoding without re-encoding against the smaller bound — prune with
    tombstone folding on an UNBLOCKED index records the original bound
    as stats['docid_bound'] (blocked blobs are bounded by the block
    width alone, so blocked indexes never need this). Every decode path
    must use this, never stats['num_docs'], as the EF bound; scoring
    (IDF) keeps using the live num_docs."""
    return int(stats.get("docid_bound", stats["num_docs"]))


def _make_encode_fn(num_docs: int, log2_quantum: int,
                    block_bits: int | None, positions: bool,
                    emit_doclens: bool = False):
    """Build the per-(term, block) EF encode kernel (applyInPandas).

    Replaces CompressorMapper.apply + BasicCompressor.compress
    (CompressorMapper.java:44-61, BasicCompressor.java:94-126): instead
    of each thread re-reading the source index, the shuffle delivers
    exactly one term-block's postings to the kernel.
    """
    q = 1 << log2_quantum

    def encode(key, pdf):
        term, block_id = key[0], int(key[1])
        pdf = pdf.sort_values("docid")
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        doclens = pdf["doclen"].to_numpy(dtype=np.int64)
        df_ = len(docids)
        cf = int(tfs.sum())

        if block_bits is None:
            rel = docids
        else:
            rel = docids - (block_id << block_bits)
        ub = block_upper_bound(block_bits, num_docs, block_id)

        docids_ef = ef.encode_docids(rel, ub, log2_quantum)
        freqs_ef = ef.encode_freqs(tfs, cf, log2_quantum)

        if positions and "positions" in pdf.columns:
            plists = [np.sort(np.asarray(p, dtype=np.int64)) for p in pdf["positions"]]
            smp = int(sum(int(p[-1]) for p in plists))
            pos_ef = ef.encode_positions(plists, df_, smp, log2_quantum)
        else:
            pos_ef, smp = None, 0

        # per-quantum block metadata for Block-Max WAND (Ding & Suel
        # SIGIR'11; the reference stores only term-level maxtf,
        # EFLexiconEntry.java:47-48 — quantum blocks reuse its skip
        # grid). (max tf, min doclen) per block bounds the block's max
        # tf-norm for ANY avgdl (tfn is increasing in tf, decreasing in
        # dl), so the metadata stays valid as the collection grows —
        # avgdl is applied query-side.
        n_q = (df_ + q - 1) // q
        q_last = docids[np.minimum(np.arange(1, n_q + 1) * q - 1, df_ - 1)]
        pad_tf = np.zeros(n_q * q, dtype=np.int64)
        pad_tf[:df_] = tfs
        q_max_tf = pad_tf.reshape(n_q, q).max(axis=1)
        pad_dl = np.full(n_q * q, np.iinfo(np.int64).max, dtype=np.int64)
        pad_dl[:df_] = doclens
        q_min_dl = pad_dl.reshape(n_q, q).min(axis=1)

        out = {
            "term": term,
            "block_id": block_id,
            "df": df_,
            "cf": cf,
            "maxtf": int(tfs.max()),
            "first_docid": int(docids[0]),
            "last_docid": int(docids[-1]),
            "docids_ef": docids_ef,
            "freqs_ef": freqs_ef,
            "positions_ef": pos_ef,
            "sum_max_pos": smp,
            "q_last_docid": q_last.tolist(),
            "q_max_tf": q_max_tf.tolist(),
            "q_min_dl": q_min_dl.tolist(),
        }
        if emit_doclens:
            # transient per-posting doclens (streaming parts only): lets
            # the compact pass recompute q_min_dl for straddled blocks
            # without any per-doc broadcast — the doclen rides the row
            out["doclens"] = doclens.tolist()
        return pd.DataFrame([out])

    return encode


def make_docs_df(base: DataFrame, tok) -> DataFrame:
    """Docs table rows from an id-carrying corpus: (docid, docno,
    doclen, sha256) — the doc-length index + per-row content integrity
    invariant (input_hint sha256)."""
    return base.select(
        F.col("doc_id").alias("docid"),
        F.concat_ws(
            "", F.col("repo"), F.lit(":"), F.col("path"),
            F.lit("@"), F.substring("commit", 1, 8),
        ).alias("docno"),
        F.size(tok(F.col("content"))).alias("doclen"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


def posting_rows(base: DataFrame, tok, positions: bool) -> DataFrame:
    """tokenize -> (docid, term, tf, doclen[, positions]) posting rows;
    the one pass over document content (map-side partial aggregation
    reduces the exploded token stream before the shuffle).

    doclen is a per-doc property computed AT TOKENIZE TIME
    (size(tokens)) and carried through the explode, so the encode stage
    never needs a per-doc join or broadcast — at 10^9+ docs a broadcast
    of per-doc doclens would exceed Spark's limit outright (the r01
    scale-killer); here the doclen simply rides the posting row."""
    toks = base.select(
        F.col("doc_id").alias("docid"), tok(F.col("content")).alias("tokens")
    )
    exploded = toks.select(
        "docid",
        F.size("tokens").alias("doclen"),
        F.posexplode("tokens").alias("pos", "term"),
    )
    agg_cols = [F.count(F.lit(1)).alias("tf"), F.min("doclen").alias("doclen")]
    if positions:
        agg_cols.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return exploded.groupBy("term", "docid").agg(*agg_cols)


def encode_rows(
    rows: DataFrame,
    num_docs: int,
    log2_quantum: int,
    block_bits: int | None,
    positions: bool,
    emit_doclens: bool = False,
) -> DataFrame:
    """posting rows (incl. the in-stream doclen column from
    posting_rows) -> per-(term, block) EF encode."""
    if block_bits is None:
        rows = rows.withColumn("block_id", F.lit(0).cast("long"))
    else:
        rows = rows.withColumn(
            "block_id", (F.col("docid") / (1 << block_bits)).cast("long")
        )
    encode = _make_encode_fn(
        num_docs, log2_quantum, block_bits, positions, emit_doclens
    )
    schema = POSTINGS_SCHEMA + (", doclens array<int>" if emit_doclens else "")
    return rows.groupBy("term", "block_id").applyInPandas(encode, schema=schema)


def make_encoded_df(
    base: DataFrame,
    num_docs: int,
    tok,
    log2_quantum: int,
    block_bits: int | None,
    positions: bool,
    emit_doclens: bool = False,
) -> DataFrame:
    """tokenize -> posting rows -> per-(term, block) EF encode.

    Used by the streaming build (one micro-batch at a time; requires
    block_bits so blob encoding is independent of global stats — see
    block_upper_bound). The batch build uses posting_rows/encode_rows
    directly so one tokenize pass feeds both docs and postings."""
    return encode_rows(
        posting_rows(base, tok, positions), num_docs,
        log2_quantum, block_bits, positions, emit_doclens,
    )


def finalize_index(
    spark: SparkSession,
    paths: IndexPaths,
    *,
    log2_quantum: int,
    positions: bool,
    block_bits: int | None,
    n_partitions: int,
    resume: bool = True,
    stage_sec: dict | None = None,
    k1: float = K1,
    b: float = B,
) -> dict:
    """Stages 3-4: lexicon + per-bucket lineage metrics + stats.json
    from the committed docs/postings parquet (the Generator finalize
    role, Generator.java:249-325). Also the endpoint of the streaming
    build, which appends postings blocks and finalizes once."""
    if stage_sec is None:
        stage_sec = {}
    postings_df = spark.read.parquet(paths.postings)
    docs_df = spark.read.parquet(paths.docs)
    row = docs_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doclen").alias("tokens"),
        F.avg("doclen").alias("avgdl"),
    ).collect()[0]
    num_docs = int(row["n"])
    num_tokens = int(row["tokens"] or 0)
    avgdl = float(row["avgdl"]) if row["avgdl"] is not None else 0.0

    # ---- stage 3: lexicon (term -> termid, df, cf, maxtf, bits) ----
    t_stage = time.time()
    if not (resume and _stage_done(paths.lexicon)):
        lex = postings_df.groupBy("term").agg(
            F.sum("df").cast("int").alias("df"),
            F.sum("cf").alias("cf"),
            F.max("maxtf").alias("maxtf"),
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            (F.sum(F.length("docids_ef")) * 8).alias("bits_docids"),
            (F.sum(F.length("freqs_ef")) * 8).alias("bits_freqs"),
        )
        cached: list = []
        lex = assign_dense_ids(
            lex, ["term"], "termid", n_partitions, release_to=cached
        )
        (lex.repartitionByRange(n_partitions, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite").parquet(paths.lexicon))
        for c in cached:  # the write materialized the ids; drop the cache
            c.unpersist()

    stage_sec["lexicon"] = time.time() - t_stage
    lexicon_df = spark.read.parquet(paths.lexicon)

    # ---- stage 4: stats + per-bucket lineage metrics ----
    t_stage = time.time()
    if not (resume and _stage_done(paths.metrics)):
        metrics = (
            postings_df.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(32)))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_term_blocks"),
                F.sum("df").alias("n_postings"),
                (F.sum(F.length("docids_ef")) * 8).alias("bits_docids"),
                (F.sum(F.length("freqs_ef")) * 8).alias("bits_freqs"),
            )
            .withColumn(
                "bits_per_posting",
                (F.col("bits_docids") + F.col("bits_freqs")) / F.col("n_postings"),
            )
        )
        metrics.coalesce(1).write.mode("overwrite").parquet(paths.metrics)
    stage_sec["metrics"] = time.time() - t_stage

    # ---- stage 4b: γ-coded doc-length artifact (stored-format parity
    # with EFDocumentIndex.java:106-112; serving still reads Parquet) ----
    t_stage = time.time()
    from terrier_ef_spark.index.doclens import (
        doclens_gamma_path,
        write_doclens_gamma,
    )

    if not (resume and _stage_done(doclens_gamma_path(paths))):
        write_doclens_gamma(spark, paths)
    stage_sec["doclens_gamma"] = time.time() - t_stage

    lex_row = lexicon_df.agg(
        F.count(F.lit(1)).alias("nt"), F.sum("df").alias("np"),
        F.sum("bits_docids").alias("bd"), F.sum("bits_freqs").alias("bf"),
    ).collect()[0]
    stats = {
        "format": FORMAT_VERSION,
        "num_docs": num_docs,
        "num_terms": int(lex_row["nt"] or 0),
        "num_postings": int(lex_row["np"] or 0),
        "num_tokens": num_tokens,
        "avgdl": avgdl,
        "log2_quantum": log2_quantum,
        "has_positions": positions,
        "block_bits": block_bits,
        "byte_order": "little",
        "bits_per_posting": (int(lex_row["bd"] or 0) + int(lex_row["bf"] or 0))
        / max(1, int(lex_row["np"] or 0)),
        "k1": k1,
        "b": b,
    }
    with open(paths.stats, "w") as fh:
        json.dump(stats, fh, indent=2)
    return stats


def build_index(spark: SparkSession, corpus: DataFrame, out_dir: str, **kwargs) -> "EFIndex":
    """Build the full EF index from a corpus DataFrame (see _build_index
    for parameters). Runs under a scoped Arrow-batch conf: the large
    batch size is load-bearing for the encode shuffle (measured 3x,
    49s -> 15s for 16.9M posting rows at local[32]) but must not leak
    into the shared session after the build's actions complete."""
    from terrier_ef_spark.conf import arrow_batch_conf

    with arrow_batch_conf(spark):
        return _build_index(spark, corpus, out_dir, **kwargs)


def _build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    log2_quantum: int = ef.DEFAULT_LOG2_QUANTUM,
    positions: bool = False,
    block_bits: int | None = None,
    n_partitions: int = 32,
    tokenizer: str = "simple",
    stopwords: list[str] | None = None,
    max_term_length: int | None = None,
    direct: bool = False,
    resume: bool = True,
    k1: float = K1,
    b: float = B,
) -> "EFIndex":
    """Build the full EF index from a corpus DataFrame.

    corpus columns: repo, path, commit, lang, content[, doc_id].
    If doc_id is absent, dense docids are assigned by global
    (repo, path, commit) order (deterministic at any parallelism).
    direct=True also materializes the forward index as a build stage
    (the reference ships Invert2Direct as a separate tool; here it is a
    flag so one job produces both orientations).

    Scale guidance — block_bits: the default (None, one blob per term)
    matches the reference layout and compresses best at small corpora,
    but a hot term's encode group then grows with the collection. At
    ~1e8+ docs ALWAYS set block_bits (e.g. 20 → ≤1M docs per encode
    group): it caps every group independent of df (the term-skew salt
    the north rule requires), costs only the lower-bits delta of a
    wider-than-needed block bound, and is what makes incremental
    (streaming) appends byte-identical to batch rebuilds.
    """
    from terrier_ef_spark.index.reader import EFIndex  # avoid cycle

    os.makedirs(out_dir, exist_ok=True)
    paths = IndexPaths(out_dir)
    t0 = time.time()
    if callable(tokenizer):
        tok, tok_name = tokenizer, getattr(tokenizer, "__name__", "custom")
    else:
        tok = make_tokenizer(tokenizer, stopwords, max_term_length)
        tok_name = tokenizer
    build_params = {
        "format": FORMAT_VERSION,
        "log2_quantum": log2_quantum,
        "positions": positions,
        "block_bits": block_bits,
        "n_partitions": n_partitions,
        "tokenizer": tok_name,
        "stopwords": sorted(stopwords) if stopwords else None,
        "max_term_length": max_term_length,
    }
    resume = _check_resume(paths, build_params, resume)
    stage_sec: dict[str, float] = {}

    # ---- stages 1+2: ONE tokenize pass feeds both the docs table and
    # the postings encode (content is read and tokenized exactly once;
    # at 100 TB input, halving content scans dominates everything else).
    need_docs = not (resume and _stage_done(paths.docs))
    need_postings = not (resume and _stage_done(paths.postings))
    rows = None
    ids_cached: list = []
    if need_docs or need_postings:
        base = corpus
        if "doc_id" not in base.columns:
            base = assign_dense_ids(
                base, ["repo", "path", "commit"], "doc_id", n_partitions,
                release_to=ids_cached,
            )
        rows = posting_rows(base, tok, positions).persist()

    t_stage = time.time()
    if need_docs:
        doclens = rows.groupBy("docid").agg(
            F.sum("tf").cast("int").alias("doclen")
        )
        # persist before repartitionByRange: range partitioning SAMPLES
        # its input, which would otherwise re-run the whole upstream
        # computation a second time just to pick split points
        docs = (
            base.select(
                F.col("doc_id").alias("docid"),
                F.concat_ws(
                    "", F.col("repo"), F.lit(":"), F.col("path"),
                    F.lit("@"), F.substring("commit", 1, 8),
                ).alias("docno"),
                F.sha2(F.col("content"), 256).alias("sha256"),
            )
            .join(doclens, "docid", "left")
            .na.fill({"doclen": 0})
            .select("docid", "docno", "doclen", "sha256")
            .persist()
        )
        (docs.repartitionByRange(n_partitions, "docid")
             .sortWithinPartitions("docid")
             .write.mode("overwrite").parquet(paths.docs))
        docs.unpersist()

    stage_sec["docs"] = time.time() - t_stage
    docs_df = spark.read.parquet(paths.docs)
    num_docs = docs_df.count()
    if block_bits is None and num_docs:
        # unblocked blobs encode absolute docids bounded by num_docs, so
        # doc_ids must be dense 0..n-1 (corpus.synthesize_corpus's
        # contract); a FILTERED corpus keeps original ids and would
        # otherwise fail deep in the EF kernel with a bound error
        max_id = docs_df.agg(F.max("docid")).collect()[0][0]
        if int(max_id) >= num_docs:
            raise ValueError(
                f"doc_ids are sparse (max {max_id} >= num_docs "
                f"{num_docs}): an unblocked index requires dense "
                "0..n-1 ids — pass block_bits (recommended at scale; "
                "blocked blobs bound docids by the block width), or "
                "renumber, e.g. by dropping doc_id so assign_dense_ids "
                "runs"
            )

    # ---- blocked EF encode -> postings parquet ----
    t_stage = time.time()
    if need_postings:
        encoded = encode_rows(
            rows, num_docs, log2_quantum, block_bits, positions,
        ).persist()  # EF-encode once; range sampling reads the cache
        (encoded.repartitionByRange(n_partitions, "term", "block_id")
                .sortWithinPartitions("term", "block_id")
                .write.mode("overwrite").parquet(paths.postings))
        encoded.unpersist()
    if rows is not None:
        rows.unpersist()
    for c in ids_cached:  # docs+postings writes consumed the id map
        c.unpersist()

    stage_sec["postings"] = time.time() - t_stage

    finalize_index(
        spark, paths,
        log2_quantum=log2_quantum, positions=positions, block_bits=block_bits,
        n_partitions=n_partitions, resume=resume, stage_sec=stage_sec,
        k1=k1, b=b,
    )
    with open(paths.manifest, "w") as fh:
        json.dump(
            {
                "stages": ["docs", "postings", "lexicon", "metrics"],
                "params": {
                    "log2_quantum": log2_quantum,
                    "positions": positions,
                    "block_bits": block_bits,
                    "n_partitions": n_partitions,
                    "tokenizer": tok_name,
                },
                "build_seconds": time.time() - t0,
                "stage_seconds": {k: round(v, 2) for k, v in stage_sec.items()},
            },
            fh,
            indent=2,
        )

    index = EFIndex(spark, out_dir)
    if direct:
        from terrier_ef_spark.index.direct import build_direct

        build_direct(index, n_partitions=n_partitions, resume=resume)
    return index
