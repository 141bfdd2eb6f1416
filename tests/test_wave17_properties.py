"""Edge-semantics tests for wave-17 operators on generated micro-corpora.

The fixture corpora never produce exact distance ties, zero-variance groups,
or gram-free documents; these tests write tiny parquet tables shaped like
the fixture (the test_stats_properties pattern) and pin the behaviors the
oracles can't reach:

- k-center resolves exact farthest-point ties to the LOWEST vec_id (real
  ties, from integer-valued coordinates and duplicated points).
- n-gram novelty emits nothing for docs shorter than the gram width and its
  census partitions exactly on adversarial mixes.
- BH-FDR emits NULL (never NaN) when every value ties (zero variance).
- The curriculum take-while excludes even the top source when it alone
  exceeds the budget.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _write_embeddings(tmp_path, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
            "label": [int(i % 3) for i in range(len(vecs))],
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _write_documents(tmp_path, texts, sources=None):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources or [f"src{i % 2}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _write_events(tmp_path, types, values):
    n = len(values)
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "user_id": [i % 7 for i in range(n)],
            "event_type": types,
            "value": values,
            "props": ['{"k": 1}'] * n,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


# integer-valued coordinates force EXACT distance ties (doubles hold small
# ints exactly), and a tiny grid plus duplicated rows makes them common
_vec = st.lists(st.integers(0, 3), min_size=3, max_size=3)


@_SETTINGS
@given(st.lists(_vec, min_size=6, max_size=10))
def test_kcenter_resolves_exact_ties_to_lowest_id(spark, tmp_path_factory, vecs):
    from sparkstreaming_quickstart_spark.queries.wave17 import (
        _KCENTER_K,
        q293_kcenter_coreset,
    )

    vecs = vecs + vecs[:2]  # guarantee duplicated points
    sf = _write_embeddings(tmp_path_factory.mktemp("kc"), vecs)
    rows = q293_kcenter_coreset(spark, sf).orderBy("step").collect()
    X = np.asarray(vecs, dtype="float64")
    sel = [0]
    for r in range(1, _KCENTER_K):
        d2 = ((X[:, None, :] - X[sel][None, :, :]) ** 2).sum(axis=2).min(axis=1)
        best = int(np.argmax(d2))  # first occurrence = lowest id
        sel.append(best)
    assert [r["vec_id"] for r in rows] == sel
    for r in rows[1:]:
        ref = math.sqrt(
            ((X[r["vec_id"]] - X[sel[: r["step"]]]) ** 2).sum(axis=1).min()
        )
        assert abs(r["radius"] - round(ref, 6)) < 1e-9


@_SETTINGS
@given(
    st.lists(
        st.integers(0, 6).map(lambda n: " ".join(["w%d" % (i % 4) for i in range(n)])),
        min_size=2,
        max_size=12,
    )
)
def test_ngram_novelty_census_on_short_docs(spark, tmp_path_factory, texts):
    from sparkstreaming_quickstart_spark.queries.wave17 import q291_ngram_novelty

    texts = [t if t else "x" for t in texts]  # length(text) > 0 filter parity
    sf = _write_documents(tmp_path_factory.mktemp("ng"), texts)
    rows = q291_ngram_novelty(spark, sf).collect()
    # pure-Python census
    inst: dict[str, int] = {}
    grams: dict[str, set] = {}
    for i, t in enumerate(texts):
        src = f"src{i % 2}"
        toks = t.split(" ")
        for j in range(len(toks) - 2):
            g = " ".join(toks[j : j + 3])
            inst[src] = inst.get(src, 0) + 1
            grams.setdefault(src, set()).add(g)
    got_inst: dict[str, int] = {}
    got_novel: dict[str, int] = {}
    for r in rows:
        got_inst[r["source"]] = got_inst.get(r["source"], 0) + r["instances"]
        got_novel[r["source"]] = got_novel.get(r["source"], 0) + r["novel_ngrams"]
    assert got_inst == inst  # sources with only short docs emit nothing
    assert got_novel == {s: len(g) for s, g in grams.items()}


def test_fdr_all_constant_values_yield_null_not_nan(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave17 import q286_fdr_bh_correction

    sf = _write_events(
        tmp_path_factory.mktemp("fdr"),
        types=["a", "b"] * 20,
        values=[5.0] * 40,
    )
    rows = q286_fdr_bh_correction(spark, sf).collect()
    assert len(rows) == 2
    for r in rows:
        # NULLIF'd degenerate denominator: z is NULL (never NaN), and both
        # engines' NULL-ignoring LEAST then clamps p to 1.0 -- a zero-
        # variance group carries no evidence and is never rejected.
        assert r["z_stat"] is None
        assert r["p_value"] == 1.0
        assert r["q_bh"] == 1.0
        assert r["rejected"] is False
        assert r["n"] == 20


def test_fdr_bh_exact_p_ties_resolve_by_event_type(spark, tmp_path_factory):
    """Round-7 hardening: BH ranks on ROUND(p, 9) with the event_type
    tie-break (unrounded exp()-derived p is the float-ordering exposure).
    Two groups with identical distributions produce an EXACT p tie: the
    rank must resolve by event_type, and every p-tied group must share the
    same adjusted q and rejection decision (BH assigns tied p's the same
    step-up minimum regardless of which tie ranks first)."""
    from sparkstreaming_quickstart_spark.queries.wave17 import (
        q286_fdr_bh_correction,
    )

    # a and b identically distributed (exact z/p tie); c clearly shifted.
    vals_ab = [float(v) for v in (1, 2, 3, 4, 5) * 8]
    vals_c = [float(v + 50) for v in (1, 2, 3, 4, 5) * 8]
    sf = _write_events(
        tmp_path_factory.mktemp("bhtie"),
        types=["a"] * 40 + ["b"] * 40 + ["c"] * 40,
        values=vals_ab + vals_ab + vals_c,
    )
    rows = {r["event_type"]: r for r in q286_fdr_bh_correction(spark, sf).collect()}
    assert rows["a"]["p_value"] == rows["b"]["p_value"]
    assert rows["a"]["q_bh"] == rows["b"]["q_bh"]
    assert rows["a"]["rejected"] == rows["b"]["rejected"]


def test_curriculum_ppm_no_overflow_on_long_documents(spark, tmp_path_factory):
    """Regression (round-6 verdict, high): the per-doc quality PPM multiplies
    the distinct-token count by 1,000,000.  F.size is int32, so without the
    BIGINT widening any document with >2,147 distinct tokens threw
    ARITHMETIC_OVERFLOW under the session's default ANSI mode -- a
    guaranteed job abort on the first long document of a real corpus."""
    from sparkstreaming_quickstart_spark.queries.wave17 import (
        q289_token_budget_curriculum,
    )

    # 3,000 distinct tokens (> 2^31 / 1e6 = 2,147), each repeated twice:
    # tok = 6,000, ndis = 3,000 -> ppm = 3000 * 1_000_000 div 6000 = 500_000.
    long_doc = " ".join(f"t{i}" for i in range(3000)) * 1
    long_doc = long_doc + " " + long_doc
    sf = _write_documents(
        tmp_path_factory.mktemp("curlong"),
        texts=[long_doc, "a b c d"],
        sources=["big", "small"],
    )
    rows = {r["source"]: r for r in q289_token_budget_curriculum(spark, sf).collect()}
    assert rows["big"]["tokens"] == 6000
    # quality = sum_ppm / 1e6 / n_docs = 500000/1e6/1 = 0.5
    assert rows["big"]["quality"] == 0.5
    # the 4-token doc is all-distinct: ppm = 1_000_000 -> quality 1.0
    assert rows["small"]["quality"] == 1.0


def test_curriculum_excludes_single_source_exceeding_budget(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave17 import (
        q289_token_budget_curriculum,
    )

    sf = _write_documents(
        tmp_path_factory.mktemp("cur"),
        texts=["a b c d e f g h"] * 4,
        sources=["only"] * 4,
    )
    rows = q289_token_budget_curriculum(spark, sf).collect()
    assert len(rows) == 1
    # the lone source holds 100% of tokens > 60% budget: take-while takes nothing
    assert rows[0]["selected"] is False
