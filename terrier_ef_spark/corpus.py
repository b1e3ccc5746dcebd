"""Deterministic synthetic source-code corpus (BASELINE.json input_hint
schema) + adapter for the driver-provided `documents` table.

Corpus shape mirrors the reference's test corpus role (22 TREC docs,
EFSetupTest.java:155-157) scaled up per FIXTURES.md F1: Zipf-skewed
vocabulary so the top token appears in most docs (exercises hot-key
handling), seeded and partition-independent — content is a pure function
of (seed, doc_id), generated with splitmix64 arithmetic inside
mapInPandas, so any cluster size produces identical rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "scala", "md"]

# first vocabulary ranks are realistic code/stopword-like tokens, so the
# Zipf head behaves like `def`/`import`/`the` in real code corpora
_HEAD_TOKENS = [
    "the", "import", "def", "return", "class", "self", "if", "else", "for",
    "in", "0", "1", "none", "true", "false", "int", "string", "public",
    "void", "new", "val", "var", "this", "static", "print", "len", "data",
    "value", "key", "result",
]
VOCAB_SIZE = 2000


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _token_rank(h: np.ndarray) -> np.ndarray:
    """Map uniform 64-bit hashes to Zipf-ish ranks in [0, VOCAB_SIZE):
    P(rank r) ~ 1/(r+1) via inverse-CDF exp(u * ln V)."""
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    r = np.floor(np.exp(u * np.log(VOCAB_SIZE))).astype(np.int64) - 1
    return np.clip(r, 0, VOCAB_SIZE - 1)


def token_name(rank: int) -> str:
    return _HEAD_TOKENS[rank] if rank < len(_HEAD_TOKENS) else f"v{rank}"


_TOKEN_NAMES = np.array(
    [token_name(r) for r in range(VOCAB_SIZE)], dtype=object
)


def doc_tokens(seed: int, doc_id: int) -> list[str]:
    """Tokens of one document — the pure function the tests audit."""
    with np.errstate(over="ignore"):
        base = np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(doc_id)
        doclen = int(_splitmix64(np.array([base]))[0] % np.uint64(581)) + 20
        idx = _splitmix64(
            base * np.uint64(1_000_003) + np.arange(doclen, dtype=np.uint64)
        )
    return _TOKEN_NAMES[_token_rank(idx)].tolist()


def synthesize_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, n_partitions: int = 32
) -> DataFrame:
    """Distributed deterministic corpus: (repo, path, commit, lang,
    content, doc_id). doc_id is dense 0..n-1 by construction (the
    'aligned ids' discipline, Generator.java:283)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                continue
            uids = ids.astype(np.uint64)
            base = np.uint64(seed) * np.uint64(0x100000001B3) + uids
            doclens = (_splitmix64(base) % np.uint64(581)).astype(np.int64) + 20
            doc_idx = np.repeat(np.arange(len(ids)), doclens)
            offs = np.concatenate([[0], np.cumsum(doclens)[:-1]])
            pos = (np.arange(int(doclens.sum())) - offs[doc_idx]).astype(np.uint64)
            h = _splitmix64(base[doc_idx] * np.uint64(1_000_003) + pos)
            names = _TOKEN_NAMES[_token_rank(h)]
            contents = (
                pd.Series(names).groupby(doc_idx).agg(" ".join).to_numpy()
            )
            hh = _splitmix64(uids + np.uint64(seed))
            langs = np.array(LANGS, dtype=object)[(hh % np.uint64(4)).astype(np.int64)]
            hx = pd.Series(hh).map(lambda x: f"{int(x):016x}")
            yield pd.DataFrame(
                {
                    "repo": pd.Series(ids % 7).map("org{}".format)
                    + "/"
                    + pd.Series(ids % 23).map("repo{}".format),
                    "path": pd.Series((ids // 23) % 41).map("src/d{}".format)
                    + "/"
                    + pd.Series(ids).map("f{}".format)
                    + "."
                    + langs,
                    "commit": (hx + hx + hx.str[:8]).to_numpy(),
                    "lang": langs,
                    "content": contents,
                    "doc_id": ids,
                }
            )

    base = spark.range(0, n_docs, numPartitions=n_partitions)
    return base.mapInPandas(
        gen,
        schema="repo string, path string, commit string, lang string,"
        " content string, doc_id long",
    )


CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def snapshot_latest(
    df: DataFrame,
    keys: tuple[str, ...] = ("repo", "path"),
    order_cols: tuple[str, ...] = ("commit",),
) -> DataFrame:
    """One row per `keys` group — the greatest `order_cols` tuple wins
    (lexicographic struct comparison). The snapshot-selection step a
    full-history source-code table needs before an index build: the
    input-hint shape (repo, path, commit, lang, content) carries every
    version of every file; the index should cover exactly one.

    100 TB shape: implemented as groupBy + max_by(struct(payload),
    struct(order)) — a declarative aggregate with MAP-SIDE PARTIAL
    aggregation, so the shuffle carries ~one candidate row per (file,
    input-partition), not the full version history. The equivalent
    row_number() window (the DuckDB twin's formulation) has no partial
    step and shuffles every version of every file; at 10^12 rows the
    difference is the job. No skew concern: group size = versions per
    file, naturally bounded, uncorrelated with hot terms.

    Determinism: max_by breaks order ties arbitrarily, so callers must
    make `order_cols` a total order within each group (append a unique
    tiebreak column, e.g. a snapshot/ingest id). With no timestamp in
    the input-hint shape, ordering by commit hash is a deterministic
    stand-in, not chronology — a real lakehouse table orders by its
    commit-time column here.
    """
    missing = [c for c in (*keys, *order_cols) if c not in df.columns]
    if missing:
        raise ValueError(f"snapshot_latest: missing columns {missing}")
    payload = [c for c in df.columns if c not in keys]
    row = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_row")
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(row)
        .select(*keys, *[F.col(f"_row.{c}").alias(c) for c in payload])
    )


def corpus_from_table(
    spark: SparkSession, table: str, where: str | None = None
) -> DataFrame:
    """Read the input corpus from a catalog table — the input_hint's
    'Iceberg table of source-code repositories with columns (repo, path,
    commit, lang, content)'. Works against any Spark catalog (Iceberg,
    Hive, or the built-in spark_catalog); the table format is the
    catalog's concern, the engine only requires the column contract.

    `where` is pushed as a SQL predicate so Iceberg/parquet partition
    pruning and row-group skipping happen at the source (e.g.
    ``lang = 'py'`` or a snapshot/commit filter). Extra columns are
    pruned here so downstream scans read only the contract columns."""
    df = spark.table(table)
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus table {table!r} is missing required columns {missing}; "
            f"expected at least {CORPUS_COLUMNS}"
        )
    if where:
        df = df.where(where)
    cols = [F.col(c) for c in CORPUS_COLUMNS]
    if "doc_id" in df.columns:
        cols.append(F.col("doc_id").cast("long").alias("doc_id"))
    return df.select(*cols)


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver `documents(doc_id, text, lang, source, n_chars)`
    table into the input_hint corpus shape (FIXTURES.md F6)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.lit("src").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
