"""File churn / hotspots + co-change coupling (pipeline/churn.py)."""

from __future__ import annotations

import pytest

from terrier_ef_spark.pipeline.churn import (
    cochange_pairs,
    cochange_skipped_commits,
    file_churn,
    hotspot_files,
)


@pytest.fixture(scope="module")
def history(spark):
    # fileA changes in c1 c2 c3 (one version stored twice for c1),
    # fileB in c1 c2, fileC in c2 only, other-repo fileA in c9
    rows = [
        ("r1", "a.py", "c1"), ("r1", "a.py", "c1"), ("r1", "a.py", "c2"),
        ("r1", "a.py", "c3"),
        ("r1", "b.py", "c1"), ("r1", "b.py", "c2"),
        ("r1", "c.py", "c2"),
        ("r2", "a.py", "c9"),
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string")


def test_file_churn(history):
    ch = file_churn(history).toPandas().set_index(["repo", "path"])
    a = ch.loc[("r1", "a.py")]
    assert a.n_versions == 4 and a.n_commits == 3
    assert a.first_commit == "c1" and a.last_commit == "c3"
    assert ch.loc[("r1", "c.py")].n_commits == 1
    assert ch.loc[("r2", "a.py")].n_commits == 1


def test_hotspots(history):
    hs = hotspot_files(history, k=2).toPandas()
    assert list(zip(hs["rank"], hs.repo, hs.path)) == [
        (1, "r1", "a.py"), (2, "r1", "b.py")
    ]


def test_cochange_pairs(history):
    pairs = cochange_pairs(history, min_cochanges=1).toPandas()
    got = {
        (ra, pa, rb, pb): n
        for ra, pa, rb, pb, n in pairs.itertuples(index=False)
    }
    # a+b share c1 and c2 (a's duplicate version row counts once);
    # a+c and b+c share c2 only; r2 file pairs with nothing
    assert got == {
        ("r1", "a.py", "r1", "b.py"): 2,
        ("r1", "a.py", "r1", "c.py"): 1,
        ("r1", "b.py", "r1", "c.py"): 1,
    }
    strict = cochange_pairs(history, min_cochanges=2).toPandas()
    assert len(strict) == 1 and strict.n_cochanges.iloc[0] == 2


def test_cochange_cap_and_ledger(spark):
    rows = [("r", f"f{i}.py", "big") for i in range(10)]
    rows += [("r", "x.py", "c1"), ("r", "y.py", "c1")]
    h = spark.createDataFrame(rows, "repo string, path string, commit string")
    pairs = cochange_pairs(h, min_cochanges=1, max_commit_files=5).toPandas()
    assert {(a, b) for a, b in zip(pairs.path_a, pairs.path_b)} == {
        ("x.py", "y.py")
    }
    ledger = cochange_skipped_commits(h, max_commit_files=5).toPandas()
    assert list(zip(ledger.commit, ledger.n_files)) == [("big", 10)]
    # cap off: C(10,2) + 1
    assert cochange_pairs(h, min_cochanges=1, max_commit_files=None) \
        .count() == 46


def test_guards(spark, history):
    with pytest.raises(ValueError, match="missing"):
        file_churn(history.drop("commit"))
    with pytest.raises(ValueError, match="k >= 1"):
        hotspot_files(history, k=0)
    with pytest.raises(ValueError, match="min_cochanges"):
        cochange_pairs(history, min_cochanges=0)
