"""The columnar fast compare must agree with the row-wise slow path: same
verdict on equal frames (any row order), on unequal frames, and a graceful
fallback for dtypes it cannot normalize in SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparkstreaming_quickstart_spark.oracle import (
    _fast_col_class,
    _normalize,
    _try_fast_compare,
)


def _frame(seed: int, n: int = 5000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "f": rng.normal(size=n),
            "i": rng.integers(0, 100, size=n),
            "s": [f"s{int(x)}" for x in rng.integers(0, 50, size=n)],
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, size=n), unit="s"),
        }
    )


def test_fast_compare_equal_frames_any_order():
    a = _frame(1)
    b = a.sample(frac=1.0, random_state=7).reset_index(drop=True)  # permuted
    cols = sorted(a.columns)
    assert _try_fast_compare(a, b, cols) is True
    assert _normalize(a) == _normalize(b)  # slow path agrees


def test_fast_compare_detects_single_cell_diff():
    a = _frame(2)
    for col, bump in [
        ("f", 1e-6),  # beyond 12 significant digits of a ~N(0,1) value
        ("i", 1),
    ]:
        b = a.copy()
        b.loc[137, col] = b.loc[137, col] + bump
        assert _try_fast_compare(a, b, sorted(a.columns)) is False
        assert _normalize(a) != _normalize(b)


def test_fast_compare_sub_ulp_float_noise_absorbed():
    # the 12-sig-digit contract: differences past the 12th significant digit
    # are absorbed by BOTH paths
    a = pd.DataFrame({"f": [1.0 / 3.0] * 10})
    b = pd.DataFrame({"f": [1.0 / 3.0 + 1e-16] * 10})
    assert _try_fast_compare(a, b, ["f"]) is True
    assert _normalize(a) == _normalize(b)


def test_fast_compare_null_vs_empty_string_distinct():
    a = pd.DataFrame({"s": ["", None, "x"]})
    b = pd.DataFrame({"s": [None, "", "x"]})  # same multiset
    c = pd.DataFrame({"s": ["", "", "x"]})  # different multiset
    assert _try_fast_compare(a, b, ["s"]) is True
    assert _try_fast_compare(a, c, ["s"]) is False


def test_fast_compare_falls_back_on_array_columns():
    a = pd.DataFrame({"v": [[1, 2], [3]]})
    assert _fast_col_class(a, "v") is None
    assert _try_fast_compare(a, a, ["v"]) is None  # caller uses slow path


def test_compare_uses_fast_path_over_threshold(spark, sf_dir, monkeypatch):
    import sparkstreaming_quickstart_spark.oracle as om

    monkeypatch.setattr(om, "_FAST_COMPARE_MIN_ROWS", 10)
    res = om.compare(
        spark,
        sf_dir,
        lambda s, d: s.read.parquet(f"{d}/nation.parquet").select(
            "n_nationkey", "n_name"
        ),
        "SELECT n_nationkey, n_name FROM nation",
    )
    assert res["ok"] and res.get("fast_path") is True


def test_negative_zero_normalizes_identically_on_both_paths():
    """Round-11 sf1 finding: q136's z-score rounded to -0.0 in DuckDB and
    +0.0 in Spark; '%.12g' renders them '-0' vs '0' and the compare
    reported a false value mismatch.  -0.0 == 0.0, so both the slow path
    (_norm_cell) and the columnar fast path's SQL normalization must
    render any zero as '0'."""
    import duckdb

    from sparkstreaming_quickstart_spark.oracle import _fast_norm_expr, _norm_cell

    assert _norm_cell(-0.0) == "0"
    assert _norm_cell(0.0) == "0"
    expr = _fast_norm_expr("x", "float")
    got = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT -0.0::DOUBLE AS x UNION ALL SELECT 0.0)"
    ).fetchall()
    assert [r[0] for r in got] == ["0", "0"]
