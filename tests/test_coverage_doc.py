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
