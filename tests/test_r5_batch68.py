"""Tests for the round-5 batch-68 tree-index operators
(treeindex_ops): treap_depth, quadtree_depth, btree_heights — DuckDB
parity plus structure pins. The treap depths are validated against a
from-scratch recursive treap BUILD (a different algorithm than the
stack construction), the O(log n)-expected average depth is pinned,
and the heap/BST orders are re-verified; the quadtree depths match a
brute per-point cell count; B-tree heights satisfy F^(h−1) < D ≤ F^h.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.treeindex_ops import (
    BT_FANOUTS,
    QT_CAP,
    QT_LEVELS,
    _btree_sql,
    _quadtree_sql,
    _treap_sql,
    q_btree_heights,
    q_quadtree_depth,
    q_treap_depth,
)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


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


def _treap_build(vals):
    """Recursive root-split treap build — independent of the stack."""
    import sys as _s

    _s.setrecursionlimit(10000)
    pr = {v: _md5_64(f"tp:{v}") for v in vals}
    depth = {}

    def build(lo, hi, d):
        if lo > hi:
            return
        seg = vals[lo : hi + 1]
        root = max(range(lo, hi + 1), key=lambda i: pr[vals[i]])
        depth[vals[root]] = d
        build(lo, root - 1, d + 1)
        build(root + 1, hi, d + 1)

    build(0, len(vals) - 1, 0)
    return depth


def test_treap_recursive_build_and_logdepth(ray_session, tmp_path):
    chars = sorted({(i * 641) % 4000 for i in range(700)})
    docs = [v for v in chars]
    _write_docs(tmp_path, docs)
    got = _unwrap(q_treap_depth(str(tmp_path)))
    exp = _treap_build(sorted(set(docs)))
    gmap = dict(zip(got["value"].astype(int), got["depth"].astype(int)))
    assert gmap == exp
    # expected depth ~ 2 ln n: pin a generous 4.5·log2(n) max and a
    # sane average
    n = len(exp)
    assert max(exp.values()) <= 4.5 * np.log2(n)
    assert np.mean(list(exp.values())) <= 3.0 * np.log2(n)
    _parity(got, _oracle(tmp_path, _treap_sql()))


def test_quadtree_brute_force_and_parity(ray_session, tmp_path):
    chars = [(i * 977) % 50000 for i in range(300)]
    _write_docs(tmp_path, chars)
    got = _unwrap(q_quadtree_depth(str(tmp_path)))
    # brute force
    x = np.array(chars, np.int64) & 0xFFFF
    y = np.arange(300, dtype=np.int64) & 0xFFFF
    from collections import Counter

    depths = []
    for i in range(300):
        d = QT_LEVELS
        for l in range(1, QT_LEVELS + 1):
            sh = 16 - l
            cell = (int(x[i]) >> sh, int(y[i]) >> sh)
            cnt = sum(
                1
                for j in range(300)
                if (int(x[j]) >> sh, int(y[j]) >> sh) == cell
            )
            if cnt <= QT_CAP:
                d = l
                break
        depths.append(d)
    exp = Counter(depths)
    assert {
        int(r["depth"]): int(r["n_points"]) for _, r in got.iterrows()
    } == dict(exp)
    _parity(got, _oracle(tmp_path, _quadtree_sql()))


def test_btree_heights_inequality_and_parity(ray_session, tmp_path):
    chars = [(i * 13) % 1000 for i in range(900)]
    _write_docs(tmp_path, chars)
    got = _unwrap(q_btree_heights(str(tmp_path)))
    d = len(set(chars))
    for _, r in got.iterrows():
        f, h = int(r["fanout"]), int(r["height"])
        assert int(r["n_keys"]) == d
        assert f ** h >= d
        if h > 1:
            assert f ** (h - 1) < d
        assert int(r["n_leaves"]) == (d + f - 1) // f
    assert set(got["fanout"].astype(int)) == set(BT_FANOUTS)
    _parity(got, _oracle(tmp_path, _btree_sql()))
