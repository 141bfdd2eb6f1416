"""Capture `.explain("formatted")` for named queries into plans/<round>/.

Optimization-round deliverable: for each query touched in a round, the
formatted physical plan is committed as plans/<round>/<query>_<suffix>.txt so
plan claims in OPTIMIZATION_<round>.md can be checked without running Spark.
Round defaults to r14; override with PLANS_ROUND.

Usage:
    python tools/capture_plans.py before q114_dedup_embedding_exact q178_...
    python tools/capture_plans.py after  q114_dedup_embedding_exact

Plans are captured at the bench scale factor (sf0.1 by default, override
with SPARK_GRAFT_SF_DIR) on the same session shape bench.py uses.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r14"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if suffix not in ("before", "after") or not names:
        print(__doc__)
        return 2

    from sparkstreaming_quickstart_spark.plans.inspect import explain_str
    from sparkstreaming_quickstart_spark.queries import all_queries
    from sparkstreaming_quickstart_spark.session import get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    registry = all_queries()
    for name in names:
        q = registry[name]
        df = q.fn(spark, SF_DIR)
        text = explain_str(df, "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
