"""Ship-path test: the job must run end-to-end via
`spark-submit --py-files <zip>` with no package installed (north_rule:
'the whole job ships via spark-submit --py-files')."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    spark_home = os.path.dirname(os.path.abspath(__import__("pyspark").__file__))
    spark_submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not available")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import make_zip

    zip_path = make_zip(str(tmp_path / "terrier_ef_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_build.py"),
            "--synth-docs", "60", "--out", str(tmp_path / "idx"),
            "--partitions", "4", "--block-bits", "5",
            "--delete-docids", "3", "7",
            "--compact-out", str(tmp_path / "idx_live"),
            "--export-prefix", str(tmp_path / "terrier_ef"),
            "--queries", "table,value", "merge",
        ],
        cwd=str(tmp_path),  # NOT the repo root: the package must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["num_docs"] == 60
    assert out["num_postings"] > 0
    # lifecycle verbs ran in the same submit: tombstone + compact
    assert out["tombstones"] == 2 and out["live_docs"] == 58
    assert out["results"], "query results missing"
    banned = {3, 7}
    assert not ({r["docid"] for r in out["results"]} & banned)
    # index artifacts landed with stage markers (resumability evidence)
    for stage in ("docs", "postings", "lexicon"):
        assert os.path.exists(tmp_path / "idx" / stage / "_SUCCESS")
    # Terrier-layout export rode the same submit (post-compact index)
    assert out["export_bits"]["docids"] > 0
    for ext in (".docids", ".freqs"):
        assert os.path.exists(str(tmp_path / "terrier_ef") + ext)
