"""Tests for the round-5 batch-49 sequence-audit operators
(seqaudit_ops): runs_test, turning_points, luhn_census — DuckDB
parity plus independent brute force. The runs test is exercised on
an alternating sequence (maximal runs) and a sorted one (2 runs);
the turning-point brute force walks every triple including the
range-boundary centers the distributed stitch must resolve; the Luhn
test plants real-checksum numbers and off-by-one invalid ones.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.seqaudit_ops import (
    LUHN_CENSUS_SQL,
    RUNS_TEST_SQL,
    TURNING_POINTS_SQL,
    _luhn_ok,
    q_luhn_census,
    q_runs_test,
    q_turning_points,
)


def _write(d, n_chars, texts=None, langs=None):
    n = len(n_chars)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts or ["x"] * n, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
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


def _brute_runs(n_chars):
    n = len(n_chars)
    thr = sum(n_chars) // n
    s = [1 if x > thr else 0 for x in n_chars]
    runs = 1 + sum(1 for i in range(1, n) if s[i] != s[i - 1])
    n1 = sum(s)
    return n - n1, n1, runs, 10**6 + 10**6 * 2 * n1 * (n - n1) // n


def test_runs_alternating_and_sorted(ray_session, tmp_path):
    alt = [10 if i % 2 == 0 else 1000 for i in range(80)]
    _write(tmp_path, alt)
    got = _unwrap(q_runs_test(str(tmp_path))).iloc[0]
    n0, n1, runs, exp = _brute_runs(alt)
    assert (int(got["n0"]), int(got["n1"]), int(got["runs"])) == (n0, n1, runs)
    assert runs == 80  # perfectly alternating: maximal runs
    assert int(got["expected_x1e6"]) == exp
    _parity(
        _unwrap(q_runs_test(str(tmp_path))), _oracle(tmp_path, RUNS_TEST_SQL)
    )

    srt = sorted(alt)
    _write(tmp_path, srt)
    got2 = _unwrap(q_runs_test(str(tmp_path))).iloc[0]
    assert int(got2["runs"]) == 2  # all lows then all highs
    _parity(
        _unwrap(q_runs_test(str(tmp_path))), _oracle(tmp_path, RUNS_TEST_SQL)
    )


def _brute_turning(n_chars):
    t = 0
    for i in range(1, len(n_chars) - 1):
        a, b, c = n_chars[i - 1], n_chars[i], n_chars[i + 1]
        if (b > a and b > c) or (b < a and b < c):
            t += 1
    return t


def test_turning_points_brute_force_and_parity(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    xs = [int(v) for v in rng.randint(0, 500, 300)]
    _write(tmp_path, xs)
    got = _unwrap(q_turning_points(str(tmp_path))).iloc[0]
    assert int(got["turning"]) == _brute_turning(xs)
    assert int(got["n"]) == 300
    assert int(got["expected_x1e6"]) == 10**6 * 2 * 298 // 3
    _parity(
        _unwrap(q_turning_points(str(tmp_path))),
        _oracle(tmp_path, TURNING_POINTS_SQL),
    )


def test_turning_points_monotone_is_zero(ray_session, tmp_path):
    _write(tmp_path, list(range(0, 500, 5)))
    got = _unwrap(q_turning_points(str(tmp_path))).iloc[0]
    assert int(got["turning"]) == 0


def test_luhn_planted_and_parity(ray_session, tmp_path):
    valid = "4539578763621486"  # passes Luhn
    assert _luhn_ok(valid)
    invalid = "4539578763621487"
    assert not _luhn_ok(invalid)
    texts = [
        f"pay with {valid} now",
        f"fake {invalid} number",
        "short 123456 digits",  # too short: not card-shaped
        f"two cards {valid} and {invalid}",
    ]
    _write(
        tmp_path,
        [len(t) for t in texts],
        texts=texts,
        langs=["en", "en", "de", "de"],
    )
    got = _unwrap(q_luhn_census(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    assert (int(g["en"]["n_digit_tokens"]), int(g["en"]["n_luhn_valid"])) == (
        2,
        1,
    )
    assert (int(g["de"]["n_digit_tokens"]), int(g["de"]["n_luhn_valid"])) == (
        2,
        1,
    )
    _parity(got, _oracle(tmp_path, LUHN_CENSUS_SQL))
