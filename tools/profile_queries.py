"""Exploratory per-query profiler (round-13 optimization round).

Times named queries at $SPARK_GRAFT_SF_DIR (default sf0.1) with the noop
sink (guide section 1.4) so we measure compute, not driver materialization.
min-of-N per query, one warm pass first.  NOT the bench -- bench.py stays
the driver contract; this is the iterate-fast loop.

Usage: python tools/profile_queries.py [-n 3] q114_... q178_...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    from sparkstreaming_quickstart_spark.queries import all_queries
    from sparkstreaming_quickstart_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
    registry = all_queries()
    for name in args:
        q = registry[name]
        times = []
        for _ in range(n):
            t0 = time.time()
            spark.sparkContext.setJobDescription(name)
            df = q.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"{name}: min={min(times):.2f}s  runs={[round(t, 2) for t in times]}",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
