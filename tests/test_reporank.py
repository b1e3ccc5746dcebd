"""Repo-level result ranking (query/reporank.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from terrier_ef_spark.query.reporank import repo_rank_top_k


@pytest.fixture(scope="module")
def page(spark):
    # qid 1: ra has ranks 1,3,5 (scores 9, 7, 5); rb ranks 2,4
    # (8, 6); docid 99 is unmapped
    rows = [
        (1, 1, 10, 9.0), (1, 2, 20, 8.0), (1, 3, 11, 7.0),
        (1, 4, 21, 6.0), (1, 5, 12, 5.0), (1, 6, 99, 4.0),
        (2, 1, 20, 3.0), (2, 2, 10, 2.5),
    ]
    return spark.createDataFrame(
        rows, "qid long, rank int, docid long, score double"
    )


@pytest.fixture(scope="module")
def repos(spark):
    return spark.createDataFrame(
        [(10, "ra"), (11, "ra"), (12, "ra"), (20, "rb"), (21, "rb")],
        "docid long, repo string",
    )


def test_sum_all_docs(page, repos):
    out = repo_rank_top_k(page, repos, k=10, per_repo=None).toPandas()
    q1 = out[out.qid == 1].set_index("repo")
    assert q1.loc["ra"].score == 21.0 and q1.loc["ra"].n_docs == 3
    assert q1.loc["rb"].score == 14.0 and q1.loc["rb"].n_docs == 2
    assert q1.loc["ra"]["rank"] == 1 and q1.loc["rb"]["rank"] == 2
    assert q1.loc["ra"].best_docid == 10 and q1.loc["rb"].best_docid == 20
    # unmapped docid 99 contributes to no group
    assert set(out.repo) == {"ra", "rb"}
    # per-qid independence: qid 2 ranks rb first
    q2 = out[out.qid == 2]
    assert list(q2.sort_values("rank").repo) == ["rb", "ra"]


def test_per_repo_cap_changes_winner(page, repos):
    # best 1 doc per repo: ra 9.0 vs rb 8.0 — ra still first; but
    # n_docs collapses to the contributing count
    out = repo_rank_top_k(page, repos, k=10, per_repo=1).toPandas()
    q1 = out[out.qid == 1].set_index("repo")
    assert q1.loc["ra"].score == 9.0 and q1.loc["ra"].n_docs == 1
    assert q1.loc["rb"].score == 8.0 and q1.loc["rb"].n_docs == 1


def test_max_agg(page, repos):
    out = repo_rank_top_k(page, repos, k=10, per_repo=None,
                          agg="max").toPandas()
    q1 = out[out.qid == 1].set_index("repo")
    assert q1.loc["ra"].score == 9.0 and q1.loc["rb"].score == 8.0
    # n_docs still counts every contributing page doc under max
    assert q1.loc["ra"].n_docs == 3


def test_tie_breaks_on_best_rank_then_repo(spark):
    page = spark.createDataFrame(
        [(1, 1, 1, 5.0), (1, 2, 2, 5.0)],
        "qid long, rank int, docid long, score double",
    )
    repos = spark.createDataFrame(
        [(1, "zz"), (2, "aa")], "docid long, repo string"
    )
    out = repo_rank_top_k(page, repos, k=10).toPandas()
    # equal scores: the repo holding the better page rank wins even
    # against a lexicographically smaller name
    assert list(out.sort_values("rank").repo) == ["zz", "aa"]


def test_k_cut_and_guards(page, repos):
    out = repo_rank_top_k(page, repos, k=1).toPandas()
    assert (out.groupby("qid")["rank"].max() == 1).all()
    with pytest.raises(ValueError, match="k >= 1"):
        repo_rank_top_k(page, repos, k=0)
    with pytest.raises(ValueError, match="per_repo"):
        repo_rank_top_k(page, repos, per_repo=0)
    with pytest.raises(ValueError, match="agg"):
        repo_rank_top_k(page, repos, agg="avg")
