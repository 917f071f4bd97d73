"""Integer PageRank: the distributed bucketed-exchange implementation
must equal a straight-line single-process reference on the same edge
formula; zero-in-degree nodes get exactly the base term. Oracle parity
is covered by the gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.queries import (
    PR_DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
    _link_targets,
    q_pagerank,
)


def straight_line_pr(n_docs: int, iters: int = PR_ITERS) -> dict[int, int]:
    edges = [(u, v, len(_link_targets(u, n_docs))) for u in range(n_docs)
             for v in _link_targets(u, n_docs)]
    pr = {v: PR_SCALE for v in range(n_docs)}
    for _ in range(iters):
        nxt = {v: PR_SCALE * 15 // 100 for v in range(n_docs)}
        for u, v, deg in edges:
            nxt[v] += pr[u] * PR_DAMP_NUM // (deg * 100)
        pr = nxt
    return pr


@pytest.mark.parametrize("n", [1, 7, 40])
def test_matches_straight_line(ray_session, tmp_path, n):
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = q_pagerank(str(tmp_path)).to_pandas().set_index("doc_id")["pagerank"].to_dict()
    assert got == straight_line_pr(n)


def test_mass_is_conserved_approximately(ray_session, tmp_path):
    # floor division only ever LOSES scaled mass: total pr must lie in
    # (n*(0.15e6), n*1e6]; catches double-counted contributions
    n = 25
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    total = int(np.sum(q_pagerank(str(tmp_path)).to_pandas()["pagerank"]))
    assert n * (PR_SCALE * 15 // 100) < total <= n * PR_SCALE


# ------------------------------------------------- triangle counting


def test_triangle_count_matches_bruteforce(ray_session, tmp_path):
    """Independent check (not the SQL oracle): enumerate the same
    deterministic edge set in pure Python and count triangles per node
    by brute force over all id triples' adjacency."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.queries import (
        _link_targets,
        q_triangle_count,
    )

    n = 40
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    edges = set()
    for did in range(n):
        for t in _link_targets(did, n):
            if t != did:
                edges.add((min(did, t), max(did, t)))
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    got = (
        q_triangle_count(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["n_tri"]
        .to_dict()
    )
    assert got == want
    assert sum(want.values()) > 0  # the planted graph must actually have triangles
