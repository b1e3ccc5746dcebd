"""describe_index tool: on-disk metadata report without a Spark
session."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from describe_index import describe  # noqa: E402


def test_describe_real_index(small_index):
    rep = describe(small_index.paths.root)
    assert rep["stats"]["num_docs"] == small_index.stats["num_docs"]
    assert rep["stats"]["num_postings"] == small_index.stats["num_postings"]
    for sub in ("postings", "lexicon", "docs"):
        assert sub in rep["artifacts"], sub
        assert rep["artifacts"][sub]["bytes"] > 0
        assert rep["artifacts"][sub]["complete"]
    assert rep["lifecycle"] == {
        "tombstoned": False, "crashed_delete_swap": False,
    }


def test_describe_lifecycle_states(tmp_path):
    root = tmp_path / "idx"
    root.mkdir()
    (root / "stats.json").write_text(json.dumps({
        "format": 2, "num_docs": 1, "num_terms": 1, "num_postings": 1,
        "num_tokens": 1, "avgdl": 1.0, "log2_quantum": 8,
    }))
    rep = describe(str(root))
    assert not rep["lifecycle"]["tombstoned"]

    # committed tombstones
    (root / "deletes").mkdir()
    (root / "deletes" / "_SUCCESS").write_text("")
    rep = describe(str(root))
    assert rep["lifecycle"]["tombstoned"]
    assert not rep["lifecycle"]["crashed_delete_swap"]

    # crashed swap: deletes_old present, deletes not committed
    os.remove(root / "deletes" / "_SUCCESS")
    (root / "deletes_old").mkdir()
    (root / "deletes_old" / "_SUCCESS").write_text("")
    rep = describe(str(root))
    assert rep["lifecycle"]["tombstoned"]
    assert rep["lifecycle"]["crashed_delete_swap"]


def test_describe_rejects_non_index(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="no stats.json"):
        describe(str(tmp_path))
