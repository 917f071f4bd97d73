"""mis_luby and mmr_rerank vs straight-line single-process references,
plus the structural guarantees (independence/maximality; diversity
actually changing the ranking). Oracle parity is pinned in
TestLastBatchOracleParity and the gate."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.linkrank_ops import q_mis_luby
from europarl_crawler_ray.pipelines.mining_ops import (
    MMR_K,
    MMR_POOL,
    _quant_vec,
    q_mmr_rerank,
)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _targets(u: int, n: int) -> list[int]:
    k = 1 + _md5_64(f"lnkk:42:{u}") % 4
    return [(u * 37 + j * 101) % n for j in range(1, k + 1)]


def _docs_table(n: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )


def _adj(n: int) -> dict[int, set]:
    adj: dict[int, set] = {u: set() for u in range(n)}
    for u in range(n):
        for v in _targets(u, n):
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
    return adj


def straight_line_mis(n: int) -> set:
    adj = _adj(n)
    pri = {v: ((_md5_64(f"mis:{v}") >> 32) << 32) | v for v in range(n)}
    und, mis = set(range(n)), set()
    while und:
        joins = {
            v
            for v in und
            if all(pri[v] > pri[w] for w in adj[v] & und)
        }
        assert joins  # Luby always makes progress
        mis |= joins
        und -= joins
        und -= {w for v in joins for w in adj[v]}
    return mis


@pytest.mark.parametrize("n", [1, 7, 60, 300])
def test_mis_matches_straight_line(ray_session, tmp_path, n):
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_mis_luby(str(tmp_path)).to_pandas()
    got = set(df.loc[df["in_mis"] == 1, "doc_id"])
    assert got == straight_line_mis(n)


def test_mis_is_independent_and_maximal(ray_session, tmp_path):
    n = 150
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_mis_luby(str(tmp_path)).to_pandas()
    mis = set(df.loc[df["in_mis"] == 1, "doc_id"])
    adj = _adj(n)
    for v in mis:  # no two MIS members adjacent
        assert not (adj[v] & mis)
    for v in set(range(n)) - mis:  # every non-member blocked by a member
        assert adj[v] & mis


# ------------------------------------------------------------------- MMR


def _write_emb(path, mat: np.ndarray):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(mat), pa.int32()),
            }
        ),
        path / "embeddings.parquet",
    )


def straight_line_mmr(mat: np.ndarray, k: int):
    q = _quant_vec(mat[:1])[0]
    cand = _quant_vec(mat[1:])
    ids = np.arange(1, len(mat))
    simq = cand @ q
    order = np.lexsort((ids, -simq))[:MMR_POOL]
    ids, simq, cand = ids[order], simq[order], cand[order]
    dots = cand @ cand.T
    picked, rows, remaining = [], [], list(range(len(ids)))
    for r in range(1, min(k, len(ids)) + 1):
        best = min(
            remaining,
            key=lambda i: (
                -(int(simq[i]) - (max(int(dots[i, j]) for j in picked) if picked else 0)),
                int(ids[i]),
            ),
        )
        score = int(simq[best]) - (
            max(int(dots[best, j]) for j in picked) if picked else 0
        )
        rows.append((r, int(ids[best]), int(simq[best]), score))
        picked.append(best)
        remaining.remove(best)
    return rows


def test_mmr_matches_straight_line(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    mat = rng.uniform(-0.5, 0.5, size=(40, 16)).astype(np.float32)
    _write_emb(tmp_path, mat)
    df = q_mmr_rerank(str(tmp_path))
    got = [tuple(int(x) for x in r) for r in df.to_numpy()]
    assert got == straight_line_mmr(mat, MMR_K)


def test_mmr_skips_near_duplicate(ray_session, tmp_path):
    # v1 and its near-duplicate v2 are the two most query-similar
    # candidates; pure top-k would rank them 1-2. The dup's penalty
    # (dot to the selected v1 ≈ its own norm) must demote it below v3,
    # which is less relevant but nearly orthogonal to v1. Note the
    # query must NOT itself be (near) a corpus vector: then
    # dot-to-selected ≡ sim-to-query for every candidate and λ=0.5 MMR
    # can never reorder — the geometry this fixture encodes.
    u = np.zeros(16, np.float32)
    w = np.zeros(16, np.float32)
    u[:8] = 0.45
    w[8:] = 0.45
    rng = np.random.RandomState(5)
    others = rng.uniform(-0.05, 0.05, size=(8, 16)).astype(np.float32)
    mat = np.vstack(
        [
            u,  # vec 0: the query
            0.9 * u + 0.3 * w,  # vec 1: top relevance
            (0.9 * u + 0.3 * w) * 0.99,  # vec 2: near-dup of vec 1
            0.8 * u - 0.3 * w,  # vec 3: relevant, anti-correlated on w
            *others,
        ]
    ).astype(np.float32)
    _write_emb(tmp_path, mat)
    df = q_mmr_rerank(str(tmp_path))
    assert int(df.loc[df["rank"] == 1, "vec_id"].iloc[0]) == 1  # top relevance
    assert int(df.loc[df["rank"] == 2, "vec_id"].iloc[0]) == 3  # dup demoted
    # but the dup is not LOST — it reappears later in the k list
    assert 2 in set(df["vec_id"])


def test_mmr_rank1_is_pure_relevance(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    mat = rng.uniform(-0.5, 0.5, size=(30, 8)).astype(np.float32)
    _write_emb(tmp_path, mat)
    df = q_mmr_rerank(str(tmp_path))
    q = _quant_vec(mat[:1])[0]
    sims = _quant_vec(mat[1:]) @ q
    best = int(np.lexsort((np.arange(1, len(mat)), -sims))[0]) + 1
    assert int(df.loc[df["rank"] == 1, "vec_id"].iloc[0]) == best
    assert int(df.loc[df["rank"] == 1, "mmr_score"].iloc[0]) == int(
        df.loc[df["rank"] == 1, "simq"].iloc[0]
    )
