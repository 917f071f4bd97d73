"""Batch-3 operator semantics: PSL algorithm branches, link_depth BFS
equality against a straight-line reference BFS, and token-budget greedy
prefix semantics. Oracle parity at gate scale is covered by the gate."""

import hashlib
from collections import deque

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from europarl_crawler_ray.functions.psl import PSL_LITE, PublicSuffixList, parse_psl
from europarl_crawler_ray.pipelines.queries import (
    LD_SEED_MOD,
    _link_targets,
    q_link_depth,
)
from europarl_crawler_ray.pipelines.training_ops import (
    TBS_BUDGET_DEN,
    TBS_SEED,
    q_token_budget_sample,
)


def _write_docs(path, texts: dict[int, str]):
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
        }
    )
    pq.write_table(t, path / "documents.parquet")


# ----------------------------------------------------------------- PSL


def test_psl_branches():
    p = PublicSuffixList()
    cases = {
        "shop5.com": ("com", "shop5.com"),
        "deep.shop5.com": ("com", "shop5.com"),  # extra labels collapse
        "a.b.shop5.ac.uk": ("ac.uk", "shop5.ac.uk"),
        "shop5.ck": ("shop5.ck", None),  # wildcard: host IS the suffix
        "deep.shop5.ck": ("shop5.ck", "deep.shop5.ck"),
        "shop5.www.ck": ("ck", "www.ck"),  # exception rule
        "shop5.foo.bar": ("bar", "foo.bar"),  # implicit * default
        "uk": ("uk", None),
        "SHOP5.Co.UK.": ("co.uk", "shop5.co.uk"),  # case + trailing dot
    }
    for host, (suffix, reg) in cases.items():
        assert p.public_suffix(host) == suffix, host
        assert p.registrable_domain(host) == reg, host


def test_psl_parser_skips_comments_and_appends_default():
    rules = parse_psl(PSL_LITE)
    assert rules[-1] == (("*",), False)
    assert (("ck", "*"), False) in rules
    assert (("ck", "www"), True) in rules
    assert all(not r[0][0].startswith("/") for r in rules)


# ---------------------------------------------------------- link_depth


def _reference_bfs(n_docs: int, max_depth: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {i: _link_targets(i, n_docs) for i in range(n_docs)}
    depth = {i: -1 for i in range(n_docs)}
    q = deque()
    for i in range(0, n_docs, LD_SEED_MOD):
        depth[i] = 0
        q.append(i)
    while q:
        u = q.popleft()
        if depth[u] >= max_depth:
            continue
        for v in adj[u]:
            if depth[v] < 0:
                depth[v] = depth[u] + 1
                q.append(v)
    return depth


def test_link_depth_matches_reference_bfs(ray_session, tmp_path):
    n = 120
    _write_docs(tmp_path, {i: "x y z" for i in range(n)})
    out = q_link_depth(str(tmp_path)).to_pandas().set_index("doc_id")["depth"]
    ref = _reference_bfs(n, max_depth=16)
    assert {int(k): int(v) for k, v in out.items()} == ref
    assert out.loc[0] == 0  # seed
    assert (out >= -1).all()


def test_link_depth_low_cap_leaves_unreachable(ray_session, tmp_path):
    n = 120
    _write_docs(tmp_path, {i: "x y z" for i in range(n)})
    out = q_link_depth(str(tmp_path), max_depth=1).to_pandas().set_index("doc_id")[
        "depth"
    ]
    ref = _reference_bfs(n, max_depth=1)
    assert {int(k): int(v) for k, v in out.items()} == ref
    assert (out <= 1).all() and (out == -1).any()


# -------------------------------------------------- token_budget_sample


def test_token_budget_sample_greedy_prefix(ray_session, tmp_path):
    texts = {i: " ".join(["w"] * (5 + i % 7)) for i in range(40)}
    _write_docs(tmp_path, texts)
    res = q_token_budget_sample(str(tmp_path))
    out = (res.to_pandas() if hasattr(res, "to_pandas") else res).sort_values(
        "prefix_tokens"
    )
    order = sorted(
        texts,
        key=lambda i: (hashlib.md5(f"{TBS_SEED}{i}".encode()).hexdigest(), i),
    )
    total = sum(len(t.split(" ")) for t in texts.values())
    budget = total // TBS_BUDGET_DEN
    run, expect = 0, []
    for i in order:
        if run >= budget:
            break
        expect.append((i, run))
        run += len(texts[i].split(" "))
    assert list(zip(out["doc_id"], out["prefix_tokens"])) == expect
    # selected token mass fills but barely overflows the budget
    assert out["n_tok"].sum() >= budget
    assert out["n_tok"].sum() - out["n_tok"].iloc[-1] < budget
