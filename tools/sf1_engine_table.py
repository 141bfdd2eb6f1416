"""Regenerate SCALING.md's sf1 per-engine wall-time ledger from the sweep
logs (round-11 verdict #5): aggregate every committed oracle_sf1_round*.log
line that carries a [spark Xs / duck Ys] split (newest log wins per query,
min across a log's repeated runs), and print the N slowest SPARK-side
entries as a markdown table.  Future regressions are then caught by diffing
a table instead of re-sweeping (q151's 332 s sf1 spark side hid in a log
until round 11 read the splits).

Usage: python tools/sf1_engine_table.py [N]
"""

from __future__ import annotations

import glob
import os
import re
import sys

PAT = re.compile(
    r"^\s*(q\w+)\s+OK rows=\d+ \(([\d.]+)s\)"
    r"(?: \[spark ([\d.]+)s / duck ([\d.]+)s\])?"
)


def collect() -> dict[str, tuple[float, float, float]]:
    """name -> (total_sec, spark_sec, duck_sec); newest round wins."""
    here = os.path.dirname(os.path.abspath(__file__))
    logs = sorted(
        glob.glob(os.path.join(here, "oracle_sf1_round*.log")),
        key=lambda p: int(re.search(r"round(\d+)", os.path.basename(p)).group(1)),
    )
    merged: dict[str, tuple[float, float, float]] = {}
    for path in logs:
        this: dict[str, tuple[float, float, float]] = {}
        with open(path) as fh:
            for line in fh:
                m = PAT.match(line)
                if not m or m.group(3) is None:
                    continue
                name = m.group(1)
                row = (float(m.group(2)), float(m.group(3)), float(m.group(4)))
                if name not in this or row[1] < this[name][1]:
                    this[name] = row  # min spark-side across a log's reruns
        merged.update(this)
    return merged


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = collect()
    top = sorted(rows.items(), key=lambda kv: -kv[1][1])[:n]
    print(f"| query | spark s | duck s | total s |")
    print("|---|---|---|---|")
    for name, (tot, sp, du) in top:
        print(f"| {name} | {sp:.1f} | {du:.1f} | {tot:.1f} |")
    print(
        f"\n({len(rows)} sf1 entries carry per-engine splits across "
        f"{len(glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), 'oracle_sf1_round*.log')))} committed logs; "
        "newest round wins per query)"
    )


if __name__ == "__main__":
    main()
