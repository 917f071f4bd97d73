"""Tests for the round-5 batch-30 columnar-codec operators
(colcodec_ops): delta_varint_gain, rle_run_census,
bitpack_width_hist — DuckDB-oracle parity plus brute force. The
planted data exercises multi-byte varints (large jumps), runs that
span range-block seams, and frames whose ranges straddle powers of
two (the exact-width edge the float-log2 shortcut would get wrong).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.colcodec_ops import (
    BITPACK_WIDTH_HIST_SQL,
    DELTA_VARINT_GAIN_SQL,
    FOR_FRAME,
    RLE_RUN_CENSUS_SQL,
    q_bitpack_width_hist,
    q_delta_varint_gain,
    q_rle_run_census,
)

N_DOCS = 300


def _lengths(n=N_DOCS):
    # small wiggles + occasional huge jumps (multi-byte varints) +
    # exact power-of-two ranges inside some frames
    out = []
    v = 100
    for i in range(n):
        if i % 37 == 5:
            v += 3_000_000  # 3-4 byte varint delta
        elif i % 37 == 6:
            v -= 3_000_000
        elif i % 29 == 7:
            v += 256  # power-of-two straddle
        else:
            v += (i % 5) - 2
        out.append(max(v, 0))
    return out


def _sources(n=N_DOCS):
    # long runs that cross the 16-block seams (block edges every ~19
    # rows; run length 45 guarantees spanning)
    return [f"s{(i // 45) % 3}" for i in range(n)]


def _write_tables(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["w"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(_sources(n), pa.string()),
                "n_chars": pa.array(_lengths(n), pa.int64()),
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


def _vbytes(v: int) -> int:
    b = 1
    while v >= 1 << (7 * b):
        b += 1
    return b


def _zz(d: int) -> int:
    return 2 * d if d >= 0 else -2 * d - 1


def test_delta_varint_gain_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_delta_varint_gain(str(tmp_path)))

    for col, vals in (
        ("doc_id", list(range(N_DOCS))),
        ("n_chars", _lengths()),
    ):
        enc = _vbytes(_zz(vals[0]))
        enc += sum(_vbytes(_zz(b - a)) for a, b in zip(vals, vals[1:]))
        raw = 8 * len(vals)
        r = got[got["col_name"] == col].iloc[0]
        assert int(r["n_values"]) == len(vals)
        assert int(r["raw_bytes"]) == raw
        assert int(r["varint_bytes"]) == enc, col
        assert int(r["saved_bp"]) == (raw - enc) * 10000 // raw
    # dense ids delta-compress to ~1 byte/value; the jumpy length
    # column compresses less
    did = got[got["col_name"] == "doc_id"].iloc[0]
    nch = got[got["col_name"] == "n_chars"].iloc[0]
    assert int(did["saved_bp"]) > 8000
    assert int(did["saved_bp"]) > int(nch["saved_bp"])

    _parity(got, _oracle(tmp_path, DELTA_VARINT_GAIN_SQL))


def test_rle_run_census_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_rle_run_census(str(tmp_path)))

    vals = _sources()
    occ: dict[str, int] = {}
    runs: dict[str, int] = {}
    for i, v in enumerate(vals):
        occ[v] = occ.get(v, 0) + 1
        if i == 0 or vals[i - 1] != v:
            runs[v] = runs.get(v, 0) + 1
    assert {
        r["source"]: (int(r["n_occ"]), int(r["n_runs"]), int(r["mean_run_len_x100"]))
        for _, r in got.iterrows()
    } == {s: (occ[s], runs[s], occ[s] * 100 // runs[s]) for s in occ}
    # the 45-long runs cross block seams: without the seam correction
    # n_runs would overcount — mean run length must be ~45
    assert all(int(r["mean_run_len_x100"]) >= 4000 for _, r in got.iterrows())

    _parity(got, _oracle(tmp_path, RLE_RUN_CENSUS_SQL))


def test_bitpack_width_hist_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_bitpack_width_hist(str(tmp_path)))

    vals = _lengths()
    exp: dict[int, list] = {}
    for f in range(0, N_DOCS, FOR_FRAME):
        chunk = vals[f : f + FOR_FRAME]
        r = max(chunk) - min(chunk)
        w = r.bit_length()
        e = exp.setdefault(w, [0, 0])
        e[0] += 1
        e[1] += len(chunk)
    assert {
        int(r["width"]): [int(r["n_frames"]), int(r["n_values"])]
        for _, r in got.iterrows()
    } == exp
    assert int(got["n_values"].sum()) == N_DOCS

    _parity(got, _oracle(tmp_path, BITPACK_WIDTH_HIST_SQL))


def test_bitpack_width_exact_at_power_of_two(ray_session, tmp_path):
    # a frame whose range is EXACTLY 2^k must report width k+1, and
    # range 2^k - 1 must report k — the float-log2 trap
    n = 2 * FOR_FRAME
    vals = [0] * n
    vals[10] = 1024  # frame 0 range 2^10 -> width 11
    vals[FOR_FRAME + 10] = 1023  # frame 1 range 2^10 - 1 -> width 10
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["w"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s0"] * n, pa.string()),
                "n_chars": pa.array(vals, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = _unwrap(q_bitpack_width_hist(str(tmp_path)))
    assert {int(r["width"]) for _, r in got.iterrows()} == {10, 11}
    _parity(got, _oracle(tmp_path, BITPACK_WIDTH_HIST_SQL))
