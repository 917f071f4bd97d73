"""Tests for the round-5 batch-46 data-valuation operators
(valuation_ops): knn_shapley, knn_loo, centroid_separation — DuckDB
parity plus independent brute force. The Shapley test recomputes the
ORIGINAL Jia et al. recursion (not the Abel-summed production form)
and checks every value, then pins the symmetry property (all labels
equal ⇒ every training point gets the identical 1/n credit); the LOO
test plants a probe whose two nearest neighbours disagree; the
centroid test plants one far-away cluster.
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

from europarl_crawler_ray.pipelines.valuation_ops import (
    CENTROID_SEPARATION_SQL,
    KNN_LOO_SQL,
    KNN_SHAPLEY_SQL,
    KS_K,
    KS_T,
    LOO_Q,
    q_centroid_separation,
    q_knn_loo,
    q_knn_shapley,
)


def _md5_64(s):
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _write(d, vecs, labels):
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def _vecs(n=60, dim=8, n_labels=3, spread=1.0):
    rng = np.random.RandomState(11)
    vecs = np.round(rng.randn(n, dim) * spread, 3)
    labels = [i % n_labels for i in range(n)]
    return vecs, labels


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
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


def _q(v):
    # through float32 first — the parquet storage type (the engines
    # both quantize the STORED float32 values)
    return np.floor(
        np.asarray(v, np.float32).astype(np.float64) * 1000.0
    ).astype(np.int64)


def _brute_shapley(vecs, labels):
    """The ORIGINAL recursion s_n = ind_n·(1e9//n);
    s_i = s_{i+1} + Δ·(1e9 // max(i, K)) — independent of the
    production Abel-summed form."""
    n = len(vecs)
    qm = _q(vecs)
    order_t = sorted(
        range(n), key=lambda v: hashlib.md5(f"ks:{v}".encode()).hexdigest()
    )[:KS_T]
    out = {}
    for t in sorted(order_t):
        keep = [i for i in range(n) if i != t]
        dots = {i: int(qm[i] @ qm[t]) for i in keep}
        ranked = sorted(keep, key=lambda i: (-dots[i], i))
        ind = [int(labels[i] == labels[t]) for i in ranked]
        m = len(ranked)
        s = [0] * m
        s[m - 1] = ind[m - 1] * (10**9 // m)
        for i in range(m - 2, -1, -1):
            s[i] = s[i + 1] + (ind[i] - ind[i + 1]) * (
                10**9 // max(i + 1, KS_K)
            )
        for pos, i in enumerate(ranked):
            out[(t, i)] = (pos + 1, s[pos])
    return out


def test_shapley_original_recursion_and_parity(ray_session, tmp_path):
    vecs, labels = _vecs()
    _write(tmp_path, vecs, labels)
    got = _unwrap(q_knn_shapley(str(tmp_path)))
    exp = _brute_shapley(vecs, labels)
    gotmap = {
        (int(r["test_id"]), int(r["vec_id"])): (
            int(r["rank"]),
            int(r["shapley_x1e9"]),
        )
        for _, r in got.iterrows()
    }
    assert gotmap == exp
    assert len(gotmap) == KS_T * (len(vecs) - 1)
    _parity(got, _oracle(tmp_path, KNN_SHAPLEY_SQL))


def test_shapley_symmetry_all_same_label(ray_session, tmp_path):
    vecs, _ = _vecs(n=40)
    labels = [7] * 40
    _write(tmp_path, vecs, labels)
    got = _unwrap(q_knn_shapley(str(tmp_path)))
    # every training point contributes identically: 1e9 // (n-1)
    vals = got["shapley_x1e9"].unique()
    assert len(vals) == 1 and int(vals[0]) == 10**9 // 39


def test_knn_loo_planted_flip_and_parity(ray_session, tmp_path):
    vecs, labels = _vecs(n=50, n_labels=2)
    _write(tmp_path, vecs, labels)
    got = _unwrap(q_knn_loo(str(tmp_path)))
    assert len(got) == min(LOO_Q, len(vecs))
    # brute-force check of every row
    qm = _q(vecs)
    for _, r in got.iterrows():
        p = int(r["probe_id"])
        keep = [i for i in range(len(vecs)) if i != p]
        ranked = sorted(keep, key=lambda i: (-int(qm[i] @ qm[p]), i))
        assert int(r["nn1"]) == ranked[0] and int(r["nn2"]) == ranked[1]
        cb = int(labels[ranked[0]] == labels[p])
        ca = int(labels[ranked[1]] == labels[p])
        assert (int(r["correct_before"]), int(r["correct_after"])) == (cb, ca)
        assert int(r["flipped"]) == int(cb != ca)
    _parity(got, _oracle(tmp_path, KNN_LOO_SQL))


def test_centroid_separation_planted_and_parity(ray_session, tmp_path):
    # labels 0/1 interleave near the origin; label 2 sits far away
    vecs = []
    labels = []
    for i in range(60):
        if i % 3 == 2:
            vecs.append([100.0 + (i % 5), 100.0, 0.0, 0.0])
            labels.append(2)
        else:
            vecs.append([(i % 7) * 0.1, (i % 3) * 0.1, 1.0, 0.0])
            labels.append(i % 3)
    _write(tmp_path, vecs, labels)
    got = _unwrap(q_centroid_separation(str(tmp_path)))
    g = {int(r["label"]): r for _, r in got.iterrows()}
    # 0 and 1 are each other's nearest; 2's nearest is one of them but
    # FAR; separations of 0/1 are tiny vs 2's
    assert g[0]["nearest_label"] == 1 and g[1]["nearest_label"] == 0
    assert int(g[2]["sep_x1e6"]) > 100 * int(g[0]["sep_x1e6"])
    _parity(got, _oracle(tmp_path, CENTROID_SEPARATION_SQL))
