"""Tests for the round-5 batch-67 coding-theory operators
(codes_ops): hamming74, gray_roundtrip, von_neumann_extract — DuckDB
parity plus theorem pins. Hamming corrects EVERY single-bit flip
(corrected_ok = 1 on all rows, syndrome = flip position); Gray
roundtrips are perfect and every in-grid step flips exactly one bit;
the extractor output sits near fair while the input stays near the
planted p = 1/4 bias.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.codes_ops import (
    GRAY_ROUNDTRIP_SQL,
    _h74_sql,
    _vn_sql,
    q_gray_roundtrip,
    q_hamming74,
    q_von_neumann_extract,
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


def test_hamming_corrects_every_flip(ray_session, tmp_path):
    # all 16 nibbles, many docs: md5 picks varied flip positions
    _write_docs(tmp_path, [i % 16 + 16 * (i % 7) for i in range(200)])
    got = _unwrap(q_hamming74(str(tmp_path)))
    # the theorem: every row corrected, syndrome names the flip
    assert (got["corrected_ok"].to_numpy(np.int64) == 1).all()
    assert (
        got["syndrome"].to_numpy(np.int64)
        == got["flip_pos"].to_numpy(np.int64)
    ).all()
    # all 8 flip positions exercised
    assert set(got["flip_pos"].astype(int)) == set(range(8))
    _parity(got, _oracle(tmp_path, _h74_sql()))


def test_gray_roundtrip_and_unit_steps(ray_session, tmp_path):
    chars = [(i * 7919) % 65536 for i in range(300)]
    _write_docs(tmp_path, chars)
    got = _unwrap(q_gray_roundtrip(str(tmp_path)))
    assert (got["roundtrip_ok"].to_numpy(np.int64) == 1).all()
    # in-grid steps flip exactly ONE bit (the wrap 65535->0 flips 1
    # too for reflected Gray: g(65535)=32768, g(0)=0 -> 1 bit)
    assert (got["step_bits"].to_numpy(np.int64) == 1).all()
    # spot: gray of x equals x ^ (x >> 1)
    for _, r in got.head(20).iterrows():
        assert int(r["gray"]) == int(r["x"]) ^ (int(r["x"]) >> 1)
    _parity(got, _oracle(tmp_path, GRAY_ROUNDTRIP_SQL))


def test_von_neumann_debiases(ray_session, tmp_path):
    _write_docs(tmp_path, [10] * 400)
    got = _unwrap(q_von_neumann_extract(str(tmp_path))).iloc[0]
    n_pairs = int(got["n_pairs"])
    assert n_pairs == 400 * 16
    # input bias ≈ 1/4 (md5 draws)
    in_rate = int(got["input_ones"]) / (2 * n_pairs)
    assert abs(in_rate - 0.25) < 0.03
    # output ≈ 1/2 — the extractor's whole point
    out_rate = int(got["ones_x1e6"]) / 1e6
    assert abs(out_rate - 0.5) < 0.05
    # expected emission rate 2·p·(1−p) = 0.375
    emit_rate = int(got["n_emitted"]) / n_pairs
    assert abs(emit_rate - 0.375) < 0.04
    _parity(
        _unwrap(q_von_neumann_extract(str(tmp_path))),
        _oracle(tmp_path, _vn_sql()),
    )
