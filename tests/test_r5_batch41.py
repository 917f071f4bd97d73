"""Tests for the round-5 batch-41 linear-sketch operators
(linsketch_ops): ams_f2, count_sketch, linear_counting — DuckDB parity
plus independent brute force. The AMS test additionally pins
LINEARITY (the sketch of a concatenated corpus equals the sum of the
parts' sketches — the property that makes the distributed reduce
exact); the Count-Sketch test pins the exact median-of-3 rule; the
linear-counting test checks the bitmap and the MLE inversion.
"""

from __future__ import annotations

import hashlib
import math
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.linsketch_ops import (
    AMS_D,
    AMS_F2_SQL,
    COUNT_SKETCH_SQL,
    CS_D,
    CS_TOPK,
    CS_W,
    LC_M,
    LINEAR_COUNTING_SQL,
    q_ams_f2,
    q_count_sketch,
    q_linear_counting,
)
import re

TOK = re.compile(r"[^ \t\n\r\f]+")


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _sign(salt, j, tok):
    return 1 if _md5_64(f"{salt}:{j}:{tok}") % 2 == 0 else -1


def _texts():
    out = []
    for i in range(70):
        out.append(
            " ".join(
                ["the", "and"] * (1 + i % 3)
                + [f"w{i % 15}"] * (i % 4)
                + [f"rare{i}"]
            )
        )
    return out


def _write(d, texts=None):
    texts = _texts() if texts is None else texts
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
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


def _counts(texts):
    c = Counter()
    for t in texts:
        c.update(TOK.findall(t.lower()))
    return c


def test_ams_brute_force_linearity_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    texts = _texts()
    got = _unwrap(q_ams_f2(str(tmp_path)))
    cnt = _counts(texts)
    f2 = sum(c * c for c in cnt.values())
    for _, r in got.iterrows():
        j = int(r["estimator"])
        s = sum(_sign("ams", j, t) * c for t, c in cnt.items())
        assert int(r["s"]) == s
        assert int(r["estimate"]) == s * s
        assert int(r["exact_f2"]) == f2
        assert int(r["err_x1e6"]) == 10**6 * abs(s * s - f2) // f2
    # linearity: sketch(part1) + sketch(part2) == sketch(whole)
    c1, c2 = _counts(texts[:35]), _counts(texts[35:])
    for j in range(AMS_D):
        s1 = sum(_sign("ams", j, t) * c for t, c in c1.items())
        s2 = sum(_sign("ams", j, t) * c for t, c in c2.items())
        sw = sum(_sign("ams", j, t) * c for t, c in cnt.items())
        assert s1 + s2 == sw
    _parity(got, _oracle(tmp_path, AMS_F2_SQL))


def test_count_sketch_median_rule_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_count_sketch(str(tmp_path)))
    assert len(got) == CS_TOPK
    cnt = _counts(_texts())
    table: dict[tuple, int] = {}
    for tok, c in cnt.items():
        for j in range(CS_D):
            h = _md5_64(f"csh:{j}:{tok}") % CS_W
            table[(j, h)] = table.get((j, h), 0) + _sign("css", j, tok) * c
    for _, r in got.iterrows():
        tok = r["token"]
        ests = sorted(
            _sign("css", j, tok)
            * table.get((j, _md5_64(f"csh:{j}:{tok}") % CS_W), 0)
            for j in range(CS_D)
        )
        assert int(r["estimate"]) == ests[CS_D // 2]
        assert int(r["exact"]) == cnt[tok]
        assert int(r["abs_err"]) == abs(ests[CS_D // 2] - cnt[tok])
    _parity(got, _oracle(tmp_path, COUNT_SKETCH_SQL))


def test_linear_counting_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_linear_counting(str(tmp_path)))
    cnt = _counts(_texts())
    bits = {_md5_64(f"lc:42:{t}") % LC_M for t in cnt}
    r = got.iloc[0]
    assert int(r["n_exact"]) == len(cnt)
    assert int(r["n_set"]) == len(bits)
    v = LC_M - len(bits)
    est = int(math.floor(LC_M * math.log(LC_M / v)))
    assert int(r["estimate"]) == est
    # sanity: with a mostly-empty bitmap the estimate is near-exact
    assert abs(est - len(cnt)) <= max(3, len(cnt) // 10)
    _parity(got, _oracle(tmp_path, LINEAR_COUNTING_SQL))
