"""Zip the terrier_ef_spark package for spark-submit --py-files.

Usage: python tools/make_pyfiles.py [dest_zip]   (default dist/terrier_ef_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "terrier_ef_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return dest


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "terrier_ef_spark.zip")
    print(make_zip(dest))
