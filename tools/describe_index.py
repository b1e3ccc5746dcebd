"""Describe an index on disk — the `IndexUtil --printstats` /
Elasticsearch `_segments` role: one human-readable (or --json) report
of an index's statistics, artifacts, parameters, lifecycle state, and
build-stage timings, read from the on-disk metadata only (no Spark
session, no postings touched — safe to run against a serving index).

Usage:
  python tools/describe_index.py <index_dir> [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ARTIFACTS = [
    # (subdir, what it is)
    ("postings", "EF posting blobs (term-range partitioned parquet)"),
    ("lexicon", "term dictionary (term-sorted, dense aligned termids)"),
    ("docs", "document metadata + doclens"),
    ("direct", "forward index (EF termid/tf blobs per doc)"),
    ("doclens_gamma", "gamma-coded doc-length bitstream (stored format)"),
    ("metrics", "per-bucket build metrics"),
    ("deletes", "tombstoned docids"),
    ("deletes_old", "pre-swap tombstones (crash fallback)"),
]


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if n < 1024 or unit == "TiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n} TiB"


def describe(root: str) -> dict:
    stats_path = os.path.join(root, "stats.json")
    if not os.path.exists(stats_path):
        raise SystemExit(f"not an index dir (no stats.json): {root}")
    with open(stats_path) as fh:
        stats = json.load(fh)

    report: dict = {"root": os.path.abspath(root), "stats": stats}

    manifest_path = os.path.join(root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            report["manifest"] = json.load(fh)

    arts = {}
    for sub, desc in ARTIFACTS:
        p = os.path.join(root, sub)
        if os.path.exists(p):
            arts[sub] = {
                "bytes": _du(p),
                "complete": (
                    os.path.exists(os.path.join(p, "_SUCCESS"))
                    if os.path.isdir(p) else True
                ),
                "role": desc,
            }
    report["artifacts"] = arts

    # Lifecycle state: a deletes/ dir with _SUCCESS means tombstones
    # are live (pruning algorithms refuse; compact folds them in);
    # deletes_old without a committed deletes/ marks a crashed swap
    # whose fallback the readers honor.
    has_del = "deletes" in arts and arts["deletes"]["complete"]
    has_old = "deletes_old" in arts
    report["lifecycle"] = {
        "tombstoned": has_del or has_old,
        "crashed_delete_swap": has_old and not has_del,
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index", help="index root dir")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    rep = describe(args.index)
    if args.json:
        json.dump(rep, sys.stdout, indent=2)
        sys.stdout.write("\n")
        return

    s = rep["stats"]
    print(f"index      {rep['root']}")
    print(f"format     v{s.get('format')}   byte order {s.get('byte_order')}")
    print(
        f"corpus     {s['num_docs']:,} docs   {s['num_terms']:,} terms   "
        f"{s['num_postings']:,} postings   {s['num_tokens']:,} tokens   "
        f"avgdl {s['avgdl']:.2f}"
    )
    print(
        f"encoding   log2_quantum={s['log2_quantum']}   "
        f"block_bits={s.get('block_bits')}   "
        f"positions={s.get('has_positions', False)}   "
        f"bits/posting={s.get('bits_per_posting', float('nan')):.3f}"
    )
    if "docid_bound" in s:
        print(f"           docid_bound={s['docid_bound']} (pruned/folded build)")
    print(
        f"scoring    k1={s.get('k1', 1.2)}   b={s.get('b', 0.75)} "
        f"(index defaults; per-query override wins)"
    )
    lc = rep["lifecycle"]
    state = "tombstoned (compact to fold)" if lc["tombstoned"] else "clean"
    if lc["crashed_delete_swap"]:
        state += "  [crashed delete swap — serving from deletes_old]"
    print(f"lifecycle  {state}")
    print("artifacts")
    for sub, a in rep["artifacts"].items():
        mark = "" if a["complete"] else "  (INCOMPLETE — no _SUCCESS)"
        print(f"  {sub:15s} {_fmt_bytes(a['bytes']):>10s}  {a['role']}{mark}")
    man = rep.get("manifest")
    if man:
        print(
            f"build      {man.get('build_seconds', 0):.1f}s total"
            + (
                "   stages: "
                + ", ".join(
                    f"{k}={v:.1f}s"
                    for k, v in man.get("stage_seconds", {}).items()
                )
                if man.get("stage_seconds")
                else ""
            )
        )
        params = man.get("params", {})
        if params:
            print(
                "params     "
                + "  ".join(f"{k}={v}" for k, v in sorted(params.items()))
            )


if __name__ == "__main__":
    main()
