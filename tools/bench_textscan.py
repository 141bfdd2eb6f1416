"""Measure dictionary-scan throughput: classic per-char Aho-Corasick vs the
dense lockstep-batch DFA vs pandas .str.count per term (q380's shape).

Round-10 verdict #4: q383's automaton is asymptotically right but its char
loop is Python -- record chars/sec/core and the |dict| crossover vs q380's
per-term JVM/pandas scan so SCALING.md states measured numbers, not claims.

Usage: python tools/bench_textscan.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb
    import numpy as np
    import pandas as pd

    from sparkstreaming_quickstart_spark.operators.text_scan import (
        AhoCorasick,
        AhoCorasickDense,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    texts = (
        duckdb.connect()
        .execute(f"SELECT text FROM '{sf_dir}/documents.parquet'")
        .df()["text"]
        .tolist()
    )
    total_chars = sum(len(t) for t in texts)
    # Dictionaries drawn from the corpus vocabulary so matches actually occur
    vocab = (
        duckdb.connect()
        .execute(
            f"SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok "
            f"FROM '{sf_dir}/documents.parquet') GROUP BY tok "
            "ORDER BY count(*) DESC"
        )
        .df()["tok"]
        .tolist()
    )
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "n_docs": len(texts),
        "total_chars": total_chars,
    }
    results: dict[str, dict[str, float]] = {}
    variants = [("head", [t for t in vocab if t])]
    # vocab TAIL = rare terms -> sparse matches (the blocklist regime); the
    # head dicts above are the match-DENSE adversarial case.
    variants.append(("tail", [t for t in reversed(vocab) if t]))
    for variant, pool in variants:
      for dict_size in (10, 100, 1000, 5000):
        terms = pool[:dict_size]
        if len(terms) < dict_size:
            break
        r: dict[str, float] = {}

        ac = AhoCorasick(terms)
        t0 = time.time()
        ref = [ac.count_nonoverlapping(t) for t in texts]
        r["classic_sec"] = round(time.time() - t0, 3)

        dense = AhoCorasickDense(terms)
        # Time the OPERATOR's path (round 13): dictionary_scan consumes the
        # sparse (doc_idx, term_idx, occ) arrays straight into Arrow; the
        # dense per-doc list-of-lists view exists only for this bench's
        # correctness assert and is built OUTSIDE the timer (its millions of
        # small Python ints triple the measured time via GC pressure, which
        # is a harness artifact, not operator cost).
        # min-of-2 (the repo's bench minima protocol): the first call in a
        # fresh process pays allocator/page-fault warm-up worth ~2x on the
        # 18 MB lane buffers, which is process state, not kernel cost.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            dis, tis, occ = dense.count_batch_sparse(texts)
            best = min(best, time.time() - t0)
        r["dense_sec"] = round(best, 3)
        got = [[0] * len(terms) for _ in texts]
        for d, t, c in zip(dis.tolist(), tis.tolist(), occ.tolist()):
            got[d][t] = c
        assert got == ref, f"dense != classic at dict={dict_size}"

        # q380's per-term shape (pandas str.count of the escaped literal --
        # one full corpus pass PER TERM; the JVM codegen path has the same
        # asymptotics with a faster constant).  Measured on a doc SAMPLE and
        # scaled linearly (it is exactly docs-linear), because at dict=5000
        # the full-corpus measurement is the quadratic blowup itself.
        import re as _re

        sample = texts[: min(len(texts), 5000)]
        scale = sum(len(t) for t in texts) / max(
            1, sum(len(t) for t in sample)
        )
        s = pd.Series(sample)
        t0 = time.time()
        mat = {t: s.str.count(_re.escape(t)).to_numpy() for t in terms}
        r["per_term_pandas_sec"] = round((time.time() - t0) * scale, 3)
        r["per_term_sampled_docs"] = len(sample)
        # sanity on the sample: same totals per term (str.count ==
        # non-overlapping count for these single-token terms)
        tot_ref = np.array(
            [ac.count_nonoverlapping(t) for t in sample]
        ).sum(axis=0)
        tot_pd = np.array([mat[t].sum() for t in terms])
        assert (tot_ref == tot_pd).all()

        r["classic_chars_per_sec"] = round(total_chars / r["classic_sec"], 0)
        r["dense_chars_per_sec"] = round(total_chars / r["dense_sec"], 0)
        r["total_matches"] = int(np.array(ref).sum())
        results[f"{variant}_{dict_size}"] = r
    out["results"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
