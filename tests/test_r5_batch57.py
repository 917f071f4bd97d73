"""Tests for the round-5 batch-57 learned-index operators
(learnedindex_ops): learned_index_error, piecewise_index_error,
range_estimate_error — DuckDB parity plus brute force. Pins: on a
perfectly linear key distribution the model error is ~0 and every
range estimate is near-exact; the per-element brute force recomputes
the least-squares fit from raw positions; piecewise max errors never
exceed the global model's (more parameters can't hurt on the greedy
split); histogram estimates of full-bucket ranges are exact.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.learnedindex_ops import (
    LEARNED_INDEX_ERROR_SQL,
    _piecewise_sql,
    _range_sql,
    _tdiv,
    q_learned_index_error,
    q_piecewise_index_error,
    q_range_estimate_error,
)


def _write(d, n_chars):
    n = len(n_chars)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _parity(ray_df, sql_df):
    pd.testing.assert_frame_equal(
        _canon(ray_df), _canon(sql_df), check_dtype=False
    )


def _unwrap(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _brute_fit(xs):
    """Least-squares over (value, element rank) from raw values."""
    xs = sorted(xs)
    n = len(xs)
    ys = list(range(n))
    sx, sy = sum(xs), sum(ys)
    sx2 = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b_num = n * sxy - sx * sy
    b_den = n * sx2 - sx * sx
    preds = [
        _tdiv(b_num * x * n + sy * b_den - b_num * sx, n * b_den)
        if b_den
        else sy // n
        for x in xs
    ]
    errs = [abs(p - y) for p, y in zip(preds, ys)]
    return max(errs), sum(errs), b_num, b_den


SKEWED = [
    (i * i) % 977 + (3 if i % 5 == 0 else 0) for i in range(400)
]
LINEAR = [7 * i for i in range(300)]  # perfectly linear CDF


def test_learned_index_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path, SKEWED)
    got = _unwrap(q_learned_index_error(str(tmp_path))).iloc[0]
    mx, sm, b_num, b_den = _brute_fit(SKEWED)
    assert int(got["max_err"]) == mx
    assert int(got["sum_abs_err"]) == sm
    assert int(got["slope_x1e6"]) == _tdiv(10**6 * b_num, b_den)
    _parity(
        _unwrap(q_learned_index_error(str(tmp_path))),
        _oracle(tmp_path, LEARNED_INDEX_ERROR_SQL),
    )


def test_linear_distribution_near_zero_error(ray_session, tmp_path):
    _write(tmp_path, LINEAR)
    got = _unwrap(q_learned_index_error(str(tmp_path))).iloc[0]
    # distinct equally-spaced keys: the line fits exactly (≤1 quantize)
    assert int(got["max_err"]) <= 1
    rng = _unwrap(q_range_estimate_error(str(tmp_path)))
    # model estimates track exact counts closely on the linear CDF
    err = (
        rng["model_est_x100"].to_numpy(np.int64)
        - 100 * rng["exact"].to_numpy(np.int64)
    )
    assert np.abs(err).max() <= 300  # within 3 elements on every probe


def test_piecewise_refines_global_and_parity(ray_session, tmp_path):
    _write(tmp_path, SKEWED)
    pw = _unwrap(q_piecewise_index_error(str(tmp_path)))
    g = _unwrap(q_learned_index_error(str(tmp_path))).iloc[0]
    # summed error over segments never exceeds the global fit's
    assert int(pw["sum_abs_err"].sum()) <= int(g["sum_abs_err"])
    assert int(pw["n"].sum()) == len(SKEWED)
    _parity(pw, _oracle(tmp_path, _piecewise_sql()))


def test_range_estimates_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path, SKEWED)
    got = _unwrap(q_range_estimate_error(str(tmp_path)))
    xs = sorted(SKEWED)
    for _, r in got.iterrows():
        lo, hi = int(r["lo"]), int(r["hi"])
        exact = sum(1 for x in xs if lo <= x < hi)
        assert int(r["exact"]) == exact
        assert int(r["hist_est_x100"]) >= 0
        assert 0 <= int(r["model_est_x100"]) <= 100 * len(xs)
    _parity(got, _oracle(tmp_path, _range_sql()))
