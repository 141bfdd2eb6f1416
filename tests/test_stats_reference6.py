"""Naive reference implementations, batch 6: the sequential/stateful
semantics -- gaps-and-islands sessionization (q34), the binned interval
attribution join (q242), and the greedy packing fold (q145) -- recomputed
as plain Python loops over raw parquet.  These are the operators whose
distributed spellings (window flags, bin-join, applyInPandas kernel)
replace an inherently sequential definition; the loop is the definition.
"""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR

_GAP_US = 1_800_000_000  # 30 min


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    return ev.assign(us=ev["ts"].astype("datetime64[us]").astype("int64"))


def test_session_windows_match_sequential_loop(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.windows import q34_session_windows

    rows = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in q34_session_windows(spark, sf_dir).collect()
    }
    ev = _events()
    ref = {}
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["us", "event_id"], kind="mergesort")
        sid, prev = 0, None
        buf = []
        for _, r in g.iterrows():
            if prev is None or r["us"] - prev > _GAP_US:
                sid += 1
                buf.append([r["ts"], r["ts"], 0])
            buf[-1][1] = max(buf[-1][1], r["ts"])
            buf[-1][2] += 1
            prev = r["us"]
        for i, (start, end, n) in enumerate(buf, start=1):
            ref[(uid, i)] = (n, start, end)
    assert len(rows) == len(ref)
    for k, (n, start, end) in ref.items():
        got = rows[k]
        assert got[0] == n and got[1] == start and got[2] == end, k


def test_touch_attribution_matches_per_purchase_scan(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave9 import q242_touch_attribution

    rows = {
        (r["first_touch"], r["last_touch"]): r["n_conversions"]
        for r in q242_touch_attribution(spark, sf_dir).collect()
    }
    ev = _events()
    day_us = 86_400_000_000
    touches = ev[ev["event_type"] != "purchase"]
    by_user = {u: g.sort_values(["us", "event_id"], kind="mergesort") for u, g in touches.groupby("user_id")}
    ref: dict[tuple, int] = {}
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        g = by_user.get(p["user_id"])
        if g is None:
            w = None
        else:
            w = g[(g["us"] <= p["us"]) & (g["us"] >= p["us"] - day_us)]
        if w is None or len(w) == 0:
            key = ("(none)", "(none)")
        else:
            key = (w.iloc[0]["event_type"], w.iloc[-1]["event_type"])
        ref[key] = ref.get(key, 0) + 1
    assert rows == ref


def test_sequence_packing_matches_greedy_loop(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.traindata import q145_sequence_packing

    rows = {
        (r["lang"], r["bin"]): (r["n_docs"], r["n_tokens"])
        for r in q145_sequence_packing(spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d = d.assign(n_tok=d["text"].str.split(" ").str.len())
    ref = {}
    for lang, grp in d.groupby("lang"):
        g = grp.sort_values("doc_id", kind="mergesort")
        bin_id, fill = 0, 0
        first = True
        for _, r in g.iterrows():
            if first:
                fill = int(r["n_tok"])
                first = False
            elif fill + int(r["n_tok"]) <= 512:
                fill += int(r["n_tok"])
            else:
                bin_id += 1
                fill = int(r["n_tok"])
            k = (lang, bin_id)
            n, t = ref.get(k, (0, 0))
            ref[k] = (n + 1, t + int(r["n_tok"]))
    assert rows == ref


if __name__ == "__main__":  # pragma: no cover
    import pytest

    pytest.main([__file__, "-q"])
