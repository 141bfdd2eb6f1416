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


# The two canonical README sentences that state the registry size.  Anchoring
# to the exact surrounding words (rather than any "<N> queries" number in the
# file) means a rephrased-but-stale count can't slip past the check, and a
# registry that legitimately shrinks below 101 still gets verified (round-4
# advisor note).
_README_COUNT_ANCHORS = [
    r"the oracle-checked registry \(driver contract\): (\d+) queries",
    r"- (\d+) registered queries, every one carrying a DuckDB oracle",
]


def test_readme_registry_count_matches():
    """The hand-written registry counts in README.md must equal the live
    registry size (the round-3 verdict caught a 279-vs-280 drift here)."""
    import re

    readme = os.path.join(os.path.dirname(COVERAGE_PATH), "README.md")
    with open(readme) as fh:
        text = fh.read()
    n = len(all_queries())
    for pattern in _README_COUNT_ANCHORS:
        m = re.search(pattern, text)
        assert m, (
            f"README.md canonical count sentence not found: /{pattern}/ -- "
            "if the sentence was reworded, update _README_COUNT_ANCHORS too"
        )
        assert int(m.group(1)) == n, (
            f"README.md states {m.group(1)} for /{pattern}/ but the live "
            f"registry has {n} queries; update README.md"
        )


def test_priority_head_targets_unchecked_queries():
    """The driver hash-checks the FIRST 50 registered queries each round, so
    `_PRIORITY`'s head must point at entries no committed CORRECTNESS_r*.json
    has already proven -- otherwise a round's coverage budget re-proves
    known-green rows (round-4 verdict task #7).  Skipped once fewer than 50
    unchecked entries remain (full driver-proof is then one sample away)."""
    import glob
    import json

    import pytest

    from sparkstreaming_quickstart_spark.queries import _PRIORITY

    repo = os.path.dirname(COVERAGE_PATH)
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            checked.update(json.load(fh).keys())
    registered = set(all_queries())
    unchecked = registered - checked
    if not unchecked:
        pytest.skip("every registered query is driver-proven")
    # With fewer unchecked entries than the 50-query sample, they must ALL
    # sit at the head (the sample then finishes the proof in one round);
    # otherwise the head-50 must be entirely unproven work.
    head_len = min(50, len(unchecked))
    head = _PRIORITY[:head_len]
    stale = [name for name in head if name in checked]
    assert not stale, (
        f"_PRIORITY head-{head_len} contains {len(stale)} already-driver-"
        f"checked queries (e.g. {stale[:5]}); rotate them to the tail so the "
        "next driver sample lands on unproven entries"
    )
    if len(unchecked) < 50:
        assert set(head) == unchecked, (
            "fewer than 50 unchecked entries remain but the priority head "
            "does not front-load exactly those; rotate so one driver sample "
            "completes the proof"
        )


def test_priority_head_refreshes_stalest_proofs():
    """Round-9 extension of the rotation contract (round-8 verdict #6):
    once every entry is driver-proven, the 50-sample budget must refresh
    the STALEST proofs, not keep re-proving recent rounds.  At least 35 of
    the head-50 must be either never-checked (new queries) or entries whose
    LAST hash proof is at least 5 rounds old; the remainder is reserved for
    this round's value-relevant edits."""
    import glob
    import json
    import re

    from sparkstreaming_quickstart_spark.queries import _PRIORITY

    repo = os.path.dirname(COVERAGE_PATH)
    last: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name in json.load(fh):
                last[name] = rnd
    if not rounds:
        return
    newest = max(rounds)
    stale_cut = newest - 5
    registered = list(all_queries())
    rank = {}
    for i, name in enumerate(_PRIORITY):
        rank.setdefault(name, i)
    head = sorted(registered, key=lambda n: rank.get(n, 10_000))[:50]
    fresh_ok = [n for n in head if n not in last or last[n] <= stale_cut]
    if len(fresh_ok) >= 35:
        return
    # Round-10 hardening (round-9 verdict "what's wrong" #1): at the start
    # of a round the driver has JUST written CORRECTNESS_r{newest} proving
    # the previous head wholesale, which would make fresh_ok == 0 even
    # though the rotation contract was honoured.  Tolerate exactly that
    # transient: an entry also counts if its ONLY fresh proof is the newest
    # file, i.e. excluding r{newest} it was never checked or stale.  A head
    # left unrotated for a further round fails again (its pre-newest proof
    # is then recent), so the guard still forces rotation one round later.
    prev_last: dict[str, int] = {n: r for n, r in last.items() if r < newest}
    prev_cut = (newest - 1) - 5
    just_proven_ok = [
        n
        for n in head
        if last.get(n) == newest
        and (n not in prev_last or prev_last[n] <= prev_cut)
    ]
    combined = set(fresh_ok) | set(just_proven_ok)
    assert len(combined) >= 35, (
        f"only {len(fresh_ok)} of the head-50 are new or stale-proven "
        f"(last proof <= r{stale_cut}) and only {len(just_proven_ok)} are "
        "in the just-proven-by-the-newest-driver-file transient; the driver "
        "sample budget is being spent re-proving recent rounds -- rotate "
        "older entries forward"
    )
