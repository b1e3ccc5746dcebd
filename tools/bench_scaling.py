"""Run one parallelism level of the scaling bench and append its JSON to
a results file. Split from bench.py --scaling so each level can run as a
separate process (clean JVM per level, same input).

Usage: python tools/bench_scaling.py <cores> <out_json>
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    out_path = sys.argv[2]
    import bench

    res = bench.run_once(cores, os.path.join(REPO, f".bench_scale_{cores}"))
    res["cores"] = cores
    with open(out_path, "w") as fh:
        json.dump(res, fh)
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
