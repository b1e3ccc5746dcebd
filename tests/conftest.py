from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from terrier_ef_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """22-doc corpus (mirrors the Shakespeare corpus size, SURVEY.md §5)."""
    from terrier_ef_spark.corpus import synthesize_corpus

    return synthesize_corpus(spark, 22, seed=42, n_partitions=4)


@pytest.fixture(scope="session")
def small_corpus(spark):
    from terrier_ef_spark.corpus import synthesize_corpus

    return synthesize_corpus(spark, 400, seed=42, n_partitions=8)


@pytest.fixture(scope="session")
def small_index(spark, small_corpus, tmp_path_factory):
    from terrier_ef_spark.index.builder import build_index

    out = str(tmp_path_factory.mktemp("idx") / "small")
    # log2_quantum=3 forces many skip pointers on tiny lists, mirroring
    # the reference tests (IndexReadingTest.java:75)
    return build_index(
        spark, small_corpus, out, log2_quantum=3, positions=True, n_partitions=8
    )


@pytest.fixture(scope="session")
def small_oracle(small_corpus):
    from terrier_ef_spark.corpus import doc_tokens
    from terrier_ef_spark.oracle import OracleIndex

    n = small_corpus.count()
    return OracleIndex({d: doc_tokens(42, d) for d in range(n)})
