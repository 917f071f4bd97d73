"""Tests for the round-5 batch-45 two-sample operators
(twosample_ops): mann_whitney, cvm_drift, energy_distance — DuckDB
parity plus independent brute force. Identical-halves corpora must
give AUC = 1/2, T = 0 and E = 0 exactly; a planted shift must push
AUC far from 1/2 and both distances positive. The MW test also pins
U2_A + U2_B = 2·nA·nB and the direct pairwise-comparison definition.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.twosample_ops import (
    CELL_W,
    CVM_DRIFT_SQL,
    ENERGY_DISTANCE_SQL,
    MANN_WHITNEY_SQL,
    N_CELLS,
    q_cvm_drift,
    q_energy_distance,
    q_mann_whitney,
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


def _cells(n_chars):
    a = [
        min(x // CELL_W, N_CELLS - 1)
        for i, x in enumerate(n_chars)
        if i % 2 == 0
    ]
    b = [
        min(x // CELL_W, N_CELLS - 1)
        for i, x in enumerate(n_chars)
        if i % 2 == 1
    ]
    return a, b


SHIFTED = [i * 40 for i in range(100)]  # evens low-ish, odds vary
PLANTED = [
    (200 if i % 2 == 0 else 3000) + (i % 5) * CELL_W for i in range(100)
]
IDENTICAL = [(i // 2 % 10) * CELL_W for i in range(100)]  # pairs match


def test_mw_pairwise_definition_and_parity(ray_session, tmp_path):
    _write(tmp_path, SHIFTED)
    got = _unwrap(q_mann_whitney(str(tmp_path)))
    a, b = _cells(SHIFTED)
    u2a = sum(
        2 * sum(1 for y in b if y < x) + sum(1 for y in b if y == x)
        for x in a
    )
    r = got.iloc[0]
    assert int(r["u2_a"]) == u2a
    assert int(r["u2_a"]) + int(r["u2_b"]) == 2 * len(a) * len(b)
    assert int(r["auc_x1e6"]) == 10**6 * u2a // (2 * len(a) * len(b))
    _parity(got, _oracle(tmp_path, MANN_WHITNEY_SQL))


def test_identical_halves_null_values(ray_session, tmp_path):
    _write(tmp_path, IDENTICAL)
    mw = _unwrap(q_mann_whitney(str(tmp_path))).iloc[0]
    assert int(mw["auc_x1e6"]) == 500000  # exactly 1/2
    cvm = _unwrap(q_cvm_drift(str(tmp_path))).iloc[0]
    assert int(cvm["t_x1e6"]) == 0
    en = _unwrap(q_energy_distance(str(tmp_path))).iloc[0]
    assert int(en["e_x1e6"]) == 0


def test_planted_shift_detected_all_three(ray_session, tmp_path):
    _write(tmp_path, PLANTED)
    mw = _unwrap(q_mann_whitney(str(tmp_path))).iloc[0]
    assert int(mw["auc_x1e6"]) < 100000  # evens far below odds
    cvm = _unwrap(q_cvm_drift(str(tmp_path))).iloc[0]
    assert int(cvm["t_x1e6"]) > 0
    en = _unwrap(q_energy_distance(str(tmp_path))).iloc[0]
    assert int(en["e_x1e6"]) > 10**6  # cells ~44 apart
    _parity(
        _unwrap(q_cvm_drift(str(tmp_path))),
        _oracle(tmp_path, CVM_DRIFT_SQL),
    )
    _parity(
        _unwrap(q_energy_distance(str(tmp_path))),
        _oracle(tmp_path, ENERGY_DISTANCE_SQL),
    )


def test_energy_brute_force(ray_session, tmp_path):
    _write(tmp_path, SHIFTED)
    got = _unwrap(q_energy_distance(str(tmp_path))).iloc[0]
    a, b = _cells(SHIFTED)
    ab = sum(abs(x - y) for x in a for y in b)
    aa = sum(abs(x - y) for x in a for y in a)
    bb = sum(abs(x - y) for x in b for y in b)
    assert int(got["ab"]) == ab and int(got["aa"]) == aa
    na, nb = len(a), len(b)
    num = 2 * ab * na * nb - aa * nb * nb - bb * na * na
    assert int(got["e_x1e6"]) == 10**6 * num // (na * na * nb * nb)
    assert num >= 0  # energy distance is nonnegative
