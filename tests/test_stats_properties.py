"""Property-based tests for the wave-10 statistics queries against
pure-Python oracles on generated micro-corpora.

The registry's DuckDB oracles prove engine/oracle agreement on the fixture;
these additionally prove the MATH on adversarial generated inputs (all-tied
values, single-language corpora, one-element groups) by writing a tiny
documents.parquet shaped like the fixture and running the registered query
builders against it.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkstreaming_quickstart_spark.queries.wave10 import (
    q250_ks_test,
    q251_mannwhitney_u,
    q259_quantile_normalize,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Small value/lang domains force heavy ties (the hard case for rank math).
_doc = st.tuples(st.integers(48, 60), st.sampled_from(["en", "de", "fr"]))


def _write_documents(tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["w " * 3] * len(rows),
            "lang": [lang for _, lang in rows],
            "source": [f"src{i % 2}" for i in range(len(rows))],
            "n_chars": [n for n, _ in rows],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


@given(rows=st.lists(_doc, min_size=2, max_size=30))
@_SETTINGS
def test_ks_statistic_matches_python_oracle(spark, tmp_path_factory, rows):
    # need at least one row on each side of the en / non-en split
    langs = {lang for _, lang in rows}
    if "en" not in langs or langs == {"en"}:
        return
    sf_dir = _write_documents(tmp_path_factory.mktemp("ks"), rows)
    got = q250_ks_test(spark, sf_dir).collect()[0]
    a = sorted(n for n, lang in rows if lang == "en")
    b = sorted(n for n, lang in rows if lang != "en")
    values = sorted(set(a) | set(b))
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in values
    )
    assert got.na == len(a) and got.nb == len(b)
    assert abs(got.d_stat - round(d, 6)) < 1e-9


@given(rows=st.lists(_doc, min_size=2, max_size=30))
@_SETTINGS
def test_mannwhitney_u_matches_python_oracle(spark, tmp_path_factory, rows):
    langs = {lang for _, lang in rows}
    if "en" not in langs or langs == {"en"}:
        return
    sf_dir = _write_documents(tmp_path_factory.mktemp("mwu"), rows)
    got = q251_mannwhitney_u(spark, sf_dir).collect()[0]
    a = [n for n, lang in rows if lang == "en"]
    b = [n for n, lang in rows if lang != "en"]
    pooled = sorted(a + b)
    # average ranks with ties (1-based)
    rank_of = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        rank_of[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    ra = sum(rank_of[x] for x in a)
    ua = ra - len(a) * (len(a) + 1) / 2.0
    assert got.na == len(a) and got.nb == len(b)
    assert abs(got.u_a - round(ua, 2)) < 1e-9
    assert abs(got.u_b - round(len(a) * len(b) - ua, 2)) < 1e-9


@given(rows=st.lists(_doc, min_size=2, max_size=30))
@_SETTINGS
def test_quantile_normalize_matches_python_percent_rank(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_documents(tmp_path_factory.mktemp("qn"), rows)
    out = q259_quantile_normalize(spark, sf_dir).collect()
    by_source: dict[str, list[int]] = {}
    docs = {}
    for i, (n, _) in enumerate(rows):
        src = f"src{i % 2}"
        by_source.setdefault(src, []).append(n)
        docs[i] = (src, n)
    for r in out:
        src, n = docs[r.doc_id]
        vals = by_source[src]
        if len(vals) == 1:
            # percent_rank of a single-row partition is 0 by definition
            assert r.pct == 0.0
            continue
        expected = sum(1 for x in vals if x < n) / (len(vals) - 1)
        assert abs(r.pct - round(expected, 6)) < 1e-9, (r, expected)


def test_degenerate_inputs_yield_null_not_ansi_error(spark, tmp_path_factory):
    """The guard class the q259 property test exposed: degenerate groups
    (all-tied values, one-sided splits) must yield NULL statistics, not an
    ANSI divide-by-zero -- and must agree with what the DuckDB oracle
    produces for the same degenerate input."""
    import math

    from sparkstreaming_quickstart_spark.queries.wave10 import (
        q251_mannwhitney_u,
        q252_anova_f,
    )

    # every doc identical length, languages split across en / de
    rows = [(50, "en"), (50, "en"), (50, "de"), (50, "de")]
    sf_dir = _write_documents(tmp_path_factory.mktemp("deg"), rows)
    r = q251_mannwhitney_u(spark, sf_dir).collect()[0]
    assert r.z is None or (isinstance(r.z, float) and math.isnan(r.z))
    assert r.u_a == 2.0  # rank math still exact: ra = 2 * 2.5, minus na(na+1)/2
    r2 = q252_anova_f(spark, sf_dir).collect()[0]
    assert r2.f_stat is None or (
        isinstance(r2.f_stat, float) and math.isnan(r2.f_stat)
    )
    assert r2.ms_within == 0.0
