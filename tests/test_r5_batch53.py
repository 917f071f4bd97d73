"""Tests for the round-5 batch-53 inequality operators
(inequality_ops): hoover_index, hhi_concentration, atkinson_index —
DuckDB parity plus brute force on planted distributions: perfectly
equal lengths give Hoover 0 and Atkinson 0; one dominant doc pushes
both up; a single-source language hits HHI = 10⁸ while an even
4-source one lands at 10⁸/4.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.inequality_ops import (
    ATK_SCALE,
    ATKINSON_INDEX_SQL,
    HHI_CONCENTRATION_SQL,
    HOOVER_INDEX_SQL,
    q_atkinson_index,
    q_hhi_concentration,
    q_hoover_index,
)


def _write(d, langs, sources, n_chars):
    n = len(langs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
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
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _parity(ray_df, sql_df):
    pd.testing.assert_frame_equal(
        _canon(ray_df), _canon(sql_df), check_dtype=False
    )


def _unwrap(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_hoover_equal_vs_skewed_and_parity(ray_session, tmp_path):
    # 'eq': 20 equal docs; 'sk': one 10000-char doc among 19 tiny
    langs = ["eq"] * 20 + ["sk"] * 20
    sources = ["s"] * 40
    chars = [100] * 20 + [10000] + [10] * 19
    _write(tmp_path, langs, sources, chars)
    got = _unwrap(q_hoover_index(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    assert int(g["eq"]["hoover_x1e6"]) == 0
    # brute force the skewed one
    xs = [10000] + [10] * 19
    n, X = len(xs), sum(xs)
    dv = sum(abs(n * x - X) for x in xs)
    assert int(g["sk"]["hoover_x1e6"]) == 10**6 * dv // (2 * n * X)
    assert int(g["sk"]["hoover_x1e6"]) > 800000  # nearly all mass moves
    _parity(got, _oracle(tmp_path, HOOVER_INDEX_SQL))


def test_hhi_bounds_and_parity(ray_session, tmp_path):
    # 'mono': single source; 'even': 4 sources x 5 docs
    langs = ["mono"] * 12 + ["even"] * 20
    sources = ["only"] * 12 + [f"s{i % 4}" for i in range(20)]
    chars = [100] * 32
    _write(tmp_path, langs, sources, chars)
    got = _unwrap(q_hhi_concentration(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    assert int(g["mono"]["hhi_x1e8"]) == 10**8
    assert int(g["even"]["hhi_x1e8"]) == 10**8 // 4
    assert int(g["even"]["n_sources"]) == 4
    _parity(got, _oracle(tmp_path, HHI_CONCENTRATION_SQL))


def test_atkinson_equal_zero_skewed_high_and_parity(ray_session, tmp_path):
    langs = ["eq"] * 10 + ["sk"] * 10
    sources = ["s"] * 20
    chars = [1000] * 10 + [100000] + [10] * 9
    _write(tmp_path, langs, sources, chars)
    got = _unwrap(q_atkinson_index(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    # equal: harmonic == arithmetic -> A == 0 (clamp handles the floor)
    assert int(g["eq"]["atkinson_x1e6"]) == 0
    # brute force the skewed branch with the quantized-reciprocal rule
    xs = [100000] + [10] * 9
    n, sx = len(xs), sum(xs)
    sr = sum(ATK_SCALE // x for x in xs)
    exp = max(0, 10**6 - (10**6 * n * n * ATK_SCALE) // (sx * sr))
    assert int(g["sk"]["atkinson_x1e6"]) == exp
    assert exp > 800000  # severe inequality under ε=2
    _parity(got, _oracle(tmp_path, ATKINSON_INDEX_SQL))
