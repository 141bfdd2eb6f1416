"""Registry-wide physical-plan audit.

Builds every registered query at sf0.001 and records the scale-critical
plan-shape metrics (parquet scans, exchanges, join strategies, Python
boundaries) into tools/plan_audit.json.  The committed file is the plan
baseline: `tests/test_plans.py::test_headline_plans_match_committed_audit`
pins the bench-headline subset against it on every pytest run, and a full
re-run of this tool diffs the whole registry after any engine-wide change
(e.g. a session conf or helper rewrite).

Usage:
    python tools/plan_audit.py              # regenerate tools/plan_audit.json
    python tools/plan_audit.py q52_... q55_...   # print metrics for a subset

Notes:
- Streaming and iterative queries execute their drains/loops at build time;
  the audited plan is the final returned DataFrame's (the driver-visible
  result), which is the contract surface.
- Counts come from the "simple" explain of the UNEXECUTED plan, so AQE
  runtime re-planning (which only ever removes exchanges) is not counted --
  the static plan is the conservative upper bound.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT_PATH = os.path.join(REPO, "tools", "plan_audit.json")
SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")

METRICS = {
    "scans": "Scan parquet",
    "exchanges": "Exchange",
    "sort_merge_joins": "SortMergeJoin",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian_products": "CartesianProduct",
    "python_evals": "BatchEvalPython",
    "arrow_python": "ArrowEvalPython",
    "map_in_pandas": "MapInPandas",
    "flatmap_groups": "FlatMapGroupsInPandas",
}


def plan_metrics(df) -> dict[str, int]:
    from sparkstreaming_quickstart_spark.plans.inspect import explain_str

    simple = explain_str(df, "simple")
    return {k: simple.count(tok) for k, tok in METRICS.items() if simple.count(tok)}


def audit(names: list[str] | None = None) -> dict[str, dict[str, int]]:
    from sparkstreaming_quickstart_spark.queries import all_queries
    from sparkstreaming_quickstart_spark.session import get_spark

    spark = get_spark("plan-audit")
    registry = all_queries()
    todo = names or sorted(registry)
    out: dict[str, dict[str, int]] = {}
    for name in todo:
        try:
            df = registry[name].fn(spark, SF_DIR)
            out[name] = plan_metrics(df)
        except Exception as exc:  # pragma: no cover - registration/env issues
            out[name] = {"error": str(exc)[:200]}
            print(f"  {name}: ERROR {exc}", file=sys.stderr)
    return out


def main() -> None:
    names = sys.argv[1:] or None
    result = audit(names)
    if names:
        print(json.dumps(result, indent=1, sort_keys=True))
        return
    with open(AUDIT_PATH, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    errs = [n for n, m in result.items() if "error" in m]
    print(f"plan_audit.json written: {len(result)} queries, {len(errs)} errors")
    if errs:
        print("errors:", errs)
        sys.exit(1)


if __name__ == "__main__":
    main()
