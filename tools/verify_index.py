"""Verify an index's integrity — the Lucene CheckIndex / fsck role
(library: terrier_ef_spark/index/verify.py). Run it after a merge,
migration, bitfile import, or any operation you want receipts for.

Usage:
  spark-submit --py-files dist/terrier_ef_spark.zip \
      tools/verify_index.py --index /path/to/index [--positions] [--json]

Exit code 0 iff every check passes.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--positions", action="store_true",
                    help="also decode + check the full positions "
                    "stream (the most expensive pass)")
    ap.add_argument("--no-doclens", action="store_true",
                    help="skip the per-doc sum(tf)==doclen fold "
                    "(the transpose-budget pass)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from terrier_ef_spark.index.reader import open_index
    from terrier_ef_spark.index.verify import verify_index

    spark = SparkSession.builder.appName("ef-verify").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    idx = open_index(spark, args.index)
    rep = verify_index(
        idx,
        check_doclens=not args.no_doclens,
        check_positions=args.positions,
    )
    if args.json:
        print(json.dumps(rep))
    else:
        for name, c in rep["checks"].items():
            mark = "OK  " if c["ok"] else "FAIL"
            print(f"{mark} {name}: {c['violations']} violation(s)")
            for s in c["samples"]:
                print(f"      {s}")
        print("INDEX OK" if rep["ok"] else "INDEX CORRUPT")
    spark.stop()
    sys.exit(0 if rep["ok"] else 1)


if __name__ == "__main__":
    main()
