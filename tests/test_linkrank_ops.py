"""linkrank_ops: the distributed Pregel implementations of HITS,
random-walk sampling, and pivot-SCC must equal straight-line
single-process references over the same deterministic edge formula.
Oracle parity is additionally pinned in TestLastBatchOracleParity."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.linkrank_ops import (
    HITS_ITERS,
    LPA_ROUNDS,
    WALK_LEN,
    WALK_SEED_MOD,
    q_hits_scores,
    q_label_prop,
    q_random_walks,
    q_scc_pivot,
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


# ------------------------------------------------------------------ HITS


def straight_line_hits(n: int, iters: int = HITS_ITERS):
    edges = [(u, v) for u in range(n) for v in _targets(u, n)]
    h = {u: 1 for u in range(n)}
    a = {u: 0 for u in range(n)}
    for _ in range(iters):
        a = {u: 0 for u in range(n)}
        for u, v in edges:
            a[v] += h[u]
        h = {u: 0 for u in range(n)}
        for u, v in edges:
            h[u] += a[v]
    return h, a


@pytest.mark.parametrize("n", [1, 7, 40, 130])
def test_hits_matches_straight_line(ray_session, tmp_path, n):
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_hits_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    h, a = straight_line_hits(n)
    assert df["hub"].to_dict() == h
    assert df["auth"].to_dict() == a


def test_hits_multiset_semantics(ray_session, tmp_path):
    # duplicate (src, dst) edges (37u+101j collisions mod small n) must
    # each contribute — the multiset, not the distinct edge set
    n = 101  # 101*j ≡ 0 (mod 101): every node's k targets all coincide
    assert any(len(set(_targets(u, n))) < len(_targets(u, n)) for u in range(n))
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_hits_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    h, a = straight_line_hits(n)
    assert df["hub"].to_dict() == h and df["auth"].to_dict() == a


# ------------------------------------------------------------ random walks


def straight_line_walks(n: int, walk_len: int = WALK_LEN):
    rows = set()
    for seed in range(0, n, WALK_SEED_MOD):
        u = seed
        rows.add((seed, 0, u))
        for t in range(1, walk_len + 1):
            k = 1 + _md5_64(f"lnkk:42:{u}") % 4
            j = 1 + _md5_64(f"walk:{seed}:{t}:{u}") % k
            u = (u * 37 + j * 101) % n
            rows.add((seed, t, u))
    return rows


@pytest.mark.parametrize("n", [1, 98, 300])
def test_walks_match_straight_line(ray_session, tmp_path, n):
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_random_walks(str(tmp_path)).to_pandas()
    got = set(zip(df["seed"], df["step"], df["node"]))
    assert got == straight_line_walks(n)
    # every walker emits exactly walk_len+1 trail rows
    assert len(df) == (1 + (n - 1) // WALK_SEED_MOD) * (WALK_LEN + 1)


def test_walk_revisits_are_distinct_rows(ray_session, tmp_path):
    # a walker that returns to an earlier node must still log one row
    # per STEP (trail is a sequence, not a visited-set)
    n = 2  # forces rapid revisits
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_random_walks(str(tmp_path)).to_pandas()
    assert len(df) == WALK_LEN + 1
    assert sorted(df["step"]) == list(range(WALK_LEN + 1))


# ------------------------------------------------------------- pivot SCC


def straight_line_scc(n: int) -> dict[int, int]:
    fwd_adj: dict[int, set] = {u: set() for u in range(n)}
    bwd_adj: dict[int, set] = {u: set() for u in range(n)}
    for u in range(n):
        for v in _targets(u, n):
            if u != v:
                fwd_adj[u].add(v)
                bwd_adj[v].add(u)

    def reach(adj):
        seen = {0}
        frontier = [0]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
        return seen

    scc = reach(fwd_adj) & reach(bwd_adj)
    return {u: int(u in scc) for u in range(n)}


@pytest.mark.parametrize("n", [1, 7, 40, 200])
def test_scc_matches_straight_line(ray_session, tmp_path, n):
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_scc_pivot(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df["in_scc"].to_dict() == straight_line_scc(n)


def test_scc_pivot_always_member(ray_session, tmp_path):
    n = 11
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_scc_pivot(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df.loc[0, "in_scc"] == 1


# --------------------------------------------------- label propagation


def straight_line_lpa(n: int, rounds: int = LPA_ROUNDS) -> dict[int, int]:
    from collections import Counter

    edges = set()
    for u in range(n):
        for v in _targets(u, n):
            if u != v:
                edges.add((u, v))
                edges.add((v, u))
    adj: dict[int, list[int]] = {u: [] for u in range(n)}
    for u, v in edges:
        adj[u].append(v)
    lbl = {u: u for u in range(n)}
    for _ in range(rounds):
        nxt = {}
        for u in range(n):
            if not adj[u]:
                nxt[u] = lbl[u]
                continue
            counts = Counter(lbl[v] for v in adj[u])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[u] = best[0]
        lbl = nxt
    return lbl


@pytest.mark.parametrize("n", [1, 7, 40, 130])
def test_label_prop_matches_straight_line(ray_session, tmp_path, n):
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_label_prop(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df["label"].to_dict() == straight_line_lpa(n)


def test_label_prop_coarsens(ray_session, tmp_path):
    # propagation must actually merge labels: far fewer distinct labels
    # than nodes once the graph is connected enough
    n = 130
    pq.write_table(_docs_table(n), tmp_path / "documents.parquet")
    df = q_label_prop(str(tmp_path)).to_pandas()
    assert df["label"].nunique() < n // 2
    # every surviving label is a real node id (labels only propagate)
    assert set(df["label"]).issubset(set(range(n)))
