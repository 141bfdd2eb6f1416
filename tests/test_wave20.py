"""Wave-20 pins: each query is re-derived by an independent scalar Python
implementation over the full sf0.001 corpus (500 docs), plus the structural
invariants that make the designs correct.

- q308: islands re-derived by a dict-based 5-gram scan + interval merge;
  every island covers >= 5 tokens, islands are disjoint (covered <=
  n_tokens), and the doc set equals q158's docs with n_dup > 0 (the two
  queries share the cross-doc duplicate-5-gram semantics).
- q309: the cut is exactly the lowest 3n//10 per source under the total
  order (ppm, doc_id), re-derived scalar-side.
- q310: first-occurrence flags re-derived with hashlib.md5; the curve's
  totals reconcile with the corpus (sum n_docs = corpus size, final
  cum_novel = distinct-text count).
"""

from __future__ import annotations

import hashlib

from sparkstreaming_quickstart_spark.queries.wave20 import (
    q308_dup_span_islands,
    q309_adaptive_quality_gate,
    q310_dedup_saturation,
)


def _docs(spark, sf_dir):
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).collect()


def _scalar_islands(rows):
    """Pure-Python re-derivation of q308 over the full corpus."""
    grams: dict[str, set[int]] = {}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    n_tokens: dict[int, int] = {}
    for r in rows:
        if not r["text"]:
            continue
        t = r["text"].split(" ")
        n_tokens[r["doc_id"]] = len(t)
        if len(t) < 5:
            per_doc[r["doc_id"]] = []
            continue
        inst = [(i + 1, " ".join(t[i : i + 5])) for i in range(len(t) - 4)]
        per_doc[r["doc_id"]] = inst
        for _, g in inst:
            grams.setdefault(g, set()).add(r["doc_id"])
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for doc_id, inst in per_doc.items():
        positions = sorted(p for p, g in inst if g in dup)
        if not positions:
            continue
        islands = []
        s = e = None
        for p in positions:
            if s is None:
                s, e = p, p + 4
            elif p <= e + 1:
                e = max(e, p + 4)
            else:
                islands.append((s, e))
                s, e = p, p + 4
        islands.append((s, e))
        spans = [hi - lo + 1 for lo, hi in islands]
        out[doc_id] = {
            "n_tokens": n_tokens[doc_id],
            "n_islands": len(islands),
            "longest_span": max(spans),
            "covered_tokens": sum(spans),
        }
    return out


def test_q308_matches_scalar_reimplementation(spark, sf_dir):
    expected = _scalar_islands(_docs(spark, sf_dir))
    got = {r["doc_id"]: r for r in q308_dup_span_islands(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for doc_id, exp in expected.items():
        g = got[doc_id]
        assert g["n_tokens"] == exp["n_tokens"]
        assert g["n_islands"] == exp["n_islands"]
        assert g["longest_span"] == exp["longest_span"]
        assert g["covered_tokens"] == exp["covered_tokens"]
        assert g["covered_ppm"] == exp["covered_tokens"] * 1000000 // exp["n_tokens"]


def test_q308_island_structure_invariants(spark, sf_dir):
    rows = q308_dup_span_islands(spark, sf_dir).collect()
    assert rows, "sf fixtures contain cross-doc duplicate 5-grams"
    for r in rows:
        # One 5-gram covers 5 tokens, so every island spans >= 5; disjoint
        # islands can never cover more than the document.
        assert r["longest_span"] >= 5
        assert r["covered_tokens"] >= 5 * r["n_islands"]
        assert r["covered_tokens"] <= r["n_tokens"]
        assert r["longest_span"] <= r["covered_tokens"]
        assert 0 < r["covered_ppm"] <= 1000000


def test_q308_doc_set_agrees_with_q158(spark, sf_dir):
    """q158's per-doc dup-5-gram census and q308's span read-out must agree
    on WHICH documents contain cross-doc duplicated 5-grams.  The shared
    semantics hold only for docs with >= 5 tokens: q158's shingle spelling
    emits one whole-text shingle for shorter docs while q308 emits nothing
    for them, so the census side excludes sub-5-token docs (rather than
    relying on the current fixture not planting duplicated short docs)."""
    from sparkstreaming_quickstart_spark.queries.corpus_quality import (
        q158_corpus_dup_ngrams,
    )

    long_enough = {
        r["doc_id"]
        for r in _docs(spark, sf_dir)
        if r["text"] and len(r["text"].split(" ")) >= 5
    }
    span_docs = {r["doc_id"] for r in q308_dup_span_islands(spark, sf_dir).collect()}
    census = {
        r["doc_id"]
        for r in q158_corpus_dup_ngrams(spark, sf_dir).collect()
        if r["n_dup"] > 0 and r["doc_id"] in long_enough
    }
    assert span_docs == census


def test_q309_cut_is_exact_rank_threshold(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    per_source: dict[str, list[tuple[int, int, int]]] = {}
    for r in rows:
        if not r["text"]:
            continue
        t = r["text"].split(" ")
        ppm = len(set(t)) * 1000000 // len(t)
        per_source.setdefault(r["source"], []).append((ppm, r["doc_id"], len(t)))
    got = {r["source"]: r for r in q309_adaptive_quality_gate(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for source, docs in per_source.items():
        docs.sort()
        n = len(docs)
        drop = n * 3 // 10
        kept = docs[drop:]
        g = got[source]
        assert g["n_docs"] == n
        assert g["n_kept"] == n - drop
        assert g["threshold_ppm"] == min(p for p, _, _ in kept)
        assert g["kept_tokens"] == sum(tok for _, _, tok in kept)
        total = sum(tok for _, _, tok in docs)
        assert g["kept_token_ppm"] == g["kept_tokens"] * 1000000 // total


def test_q310_matches_scalar_md5_scan(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    lo = min(r["doc_id"] for r in rows)
    hi = max(r["doc_id"] for r in rows)
    seen: set[str] = set()
    buckets: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        h = hashlib.md5(r["text"].encode()).hexdigest()
        novel = h not in seen
        seen.add(h)
        b = min(9, (r["doc_id"] - lo) * 10 // (hi - lo + 1))
        buckets.setdefault(b, []).append(novel)
    got = {r["bucket"]: r for r in q310_dedup_saturation(spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    cum = 0
    for b in sorted(buckets):
        n_docs = len(buckets[b])
        n_novel = sum(buckets[b])
        cum += n_novel
        g = got[b]
        assert g["n_docs"] == n_docs
        assert g["n_novel"] == n_novel
        assert g["novel_ppm"] == n_novel * 1000000 // n_docs
        assert g["cum_novel"] == cum
    assert sum(g["n_docs"] for g in got.values()) == len(rows)
    assert max(g["cum_novel"] for g in got.values()) == len(seen)


def test_q311_matches_scalar_asof(spark, sf_dir):
    """Stream-static as-of enrichment re-derived scalar-side: for every
    non-purchase event, the reference purchase is the max-(ts, event_id)
    purchase of the same user with ts <= event ts (same-ts ties collapse to
    the highest event_id -- the empty-interval rule)."""
    from sparkstreaming_quickstart_spark.queries.wave20 import q311_stream_asof_enrich
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).collect()
    purchases: dict[int, list] = {}
    for r in rows:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r)
    for plist in purchases.values():
        plist.sort(key=lambda r: (r["ts"], r["event_id"]))
    expected = {}
    for r in rows:
        if r["event_type"] == "purchase":
            continue
        cands = [p for p in purchases.get(r["user_id"], []) if p["ts"] <= r["ts"]]
        ref = cands[-1] if cands else None
        expected[r["event_id"]] = (
            (ref["event_id"], ref["value"]) if ref else (None, None)
        )
    got = q311_stream_asof_enrich(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for g in got:
        exp_id, exp_val = expected[g["event_id"]]
        assert g["ref_event_id"] == exp_id
        assert g["ref_value"] == exp_val


def test_q312_matches_scalar_pipeline(spark, sf_dir):
    """The v4 funnel re-derived scalar-side: span cut at 60% covered_ppm,
    then drop the lowest 3n//10 by (ppm, doc_id) per source AMONG SURVIVORS,
    then md5 first-occurrence dedup among the gated set."""
    from sparkstreaming_quickstart_spark.queries.wave20 import q312_corpus_pipeline_v4

    rows = [r for r in _docs(spark, sf_dir) if r["text"]]
    covered = _scalar_islands(rows)
    per_source: dict[str, list] = {}
    for r in rows:
        t = r["text"].split(" ")
        ppm = len(set(t)) * 1000000 // len(t)
        cov = covered.get(r["doc_id"])
        cov_ppm = cov["covered_tokens"] * 1000000 // cov["n_tokens"] if cov else 0
        per_source.setdefault(r["source"], []).append(
            {
                "doc_id": r["doc_id"],
                "tok": len(t),
                "ppm": ppm,
                "text": r["text"],
                "pass1": cov_ppm <= 600000,
            }
        )
    got = {r["source"]: r for r in q312_corpus_pipeline_v4(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    gated_all = []
    for source, docs in per_source.items():
        surv = sorted(
            (d for d in docs if d["pass1"]), key=lambda d: (d["ppm"], d["doc_id"])
        )
        drop = len(surv) * 3 // 10
        gated = surv[drop:]
        gated_all.extend(gated)
        g = got[source]
        assert g["n_raw"] == len(docs)
        assert g["n_span_kept"] == len(surv)
        assert g["n_gate_kept"] == len(gated)
    # dedup runs across sources (md5 is a corpus-global key)
    import hashlib as _h

    seen: set[str] = set()
    novel_ids = set()
    for d in sorted(gated_all, key=lambda d: d["doc_id"]):
        hh = _h.md5(d["text"].encode()).hexdigest()
        if hh not in seen:
            seen.add(hh)
            novel_ids.add(d["doc_id"])
    for source, docs in per_source.items():
        novel = [d for d in docs if d["doc_id"] in novel_ids]
        g = got[source]
        assert g["n_final"] == len(novel)
        assert g["final_tokens"] == sum(d["tok"] for d in novel)
        raw_tokens = sum(d["tok"] for d in docs)
        assert g["final_token_ppm"] == g["final_tokens"] * 1000000 // raw_tokens
        assert g["n_final"] <= g["n_gate_kept"] <= g["n_span_kept"] <= g["n_raw"]


def test_q311_validity_interval_tie_rule_planted(spark):
    """The empty-interval tie rule, exercised with PLANTED same-timestamp
    purchases (the fixture's microsecond timestamps never collide, so the
    corpus test can't reach this branch): two purchases of one user at the
    identical ts must collapse to the higher event_id, and an event at
    exactly that ts must match it (at-or-before includes equality)."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ts0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    before = ts0 - datetime.timedelta(hours=1)
    after = ts0 + datetime.timedelta(hours=1)
    purchases_raw = spark.createDataFrame(
        [(1, ts0, 101, 10.0), (1, ts0, 102, 20.0), (1, after, 103, 30.0)],
        "p_user long, v_start timestamp, ref_event_id long, ref_value double",
    )
    w = Window.partitionBy("p_user").orderBy("v_start", "ref_event_id")
    purchases = purchases_raw.withColumn("v_end", F.lead("v_start").over(w))
    events = spark.createDataFrame(
        [(1, 1, before), (2, 1, ts0), (3, 1, ts0 + datetime.timedelta(minutes=30)), (4, 1, after)],
        "event_id long, user_id long, ts timestamp",
    )
    joined = events.join(
        F.broadcast(purchases),
        (events["user_id"] == purchases["p_user"])
        & (events["ts"] >= purchases["v_start"])
        & (purchases["v_end"].isNull() | (events["ts"] < purchases["v_end"])),
        "left_outer",
    ).select("event_id", "ref_event_id", "ref_value")
    got = {r["event_id"]: (r["ref_event_id"], r["ref_value"]) for r in joined.collect()}
    # one output row per event (the intervals partition time)
    assert joined.count() == 4
    assert got[1] == (None, None)  # before any purchase
    assert got[2] == (102, 20.0)  # tie at ts0 -> higher event_id wins
    assert got[3] == (102, 20.0)  # between ts0 and the next purchase
    assert got[4] == (103, 30.0)  # at the later purchase exactly


def test_q312_dedup_flag_selects_first_gated_occurrence_planted(spark):
    """The running-sum dedup spelling, exercised with PLANTED duplicates
    (sf0.001/sf0.01 fixtures contain zero exact-dup texts, so the corpus
    tests never reach this branch): when the FIRST occurrence of a hash is
    NOT gated, `novel` must select the first GATED occurrence -- a naive
    row_number()==1 over the hash partition would wrongly keep nothing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        # (doc_id, h, keep2): doc 1 is the first occurrence of 'A' but was
        # dropped by the gate; docs 2 and 3 are gated duplicates of it.
        (1, "A", 0),
        (2, "A", 1),
        (3, "A", 1),
        (4, "B", 1),
        (5, "B", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, h string, keep2 int")
    w_h = (
        Window.partitionBy("h")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        "doc_id",
        F.when((F.col("keep2") == 1) & (F.sum("keep2").over(w_h) == 1), 1)
        .otherwise(0)
        .alias("novel"),
    )
    got = {r["doc_id"]: r["novel"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0}
