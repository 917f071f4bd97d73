"""Mechanism-design operators (round-5 batch 47): the optimal
assignment problem (Kuhn's Hungarian objective, 1955), Gale-Shapley
stable matching (Gale & Shapley 1962), and Top Trading Cycles
(Shapley & Scarf 1974) — the three canonical allocation mechanisms,
run over the crawl's shard-volume data: 8 data shards (volumes =
doc counts per doc_id % 8) placed onto / traded among 8 workers with
md5-derived latencies, affinities and preference ideals.

The DOMAIN is fixed at D = 8 agents — that bound is what makes each
mechanism exactly auditable: the assignment optimum is verified
against all 8! placements, the GS outcome is the lexicographic-
minimal stable matching (proposer-optimality makes those coincide),
and TTC runs its ≤ D elimination rounds in closed unrolled form.

Scale idioms: the ONLY corpus-scaled work is the shard-volume count
(a per-batch combiner → 8-row reduce); every mechanism then runs as
driver math on the 8×8 integer tables, and the oracle replays the
same mechanics in unrolled SQL (permutation enumeration for the
assignment/stability checks, pointer-chase rounds for TTC). All
inputs and costs are exact integers.

Reference parity: the reference assigns work implicitly via Postgres
row locks (europarl/workers/); these make the placement layer an
explicit, auditable mechanism.
"""

from __future__ import annotations

from itertools import permutations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .ml_queries import _md5u

MD_D = 8  # agents / shards / workers


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _shard_volumes(sf_dir: str) -> np.ndarray:
    """v_s = #docs with doc_id % D == s — the one corpus-scaled pass."""
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["doc_id"].to_numpy(np.int64) % MD_D).value_counts()
        return pd.DataFrame(
            {"shard": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)}
        )

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("shard")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    v = np.zeros(MD_D, np.int64)
    if len(agg):
        v[agg["shard"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    return v


_VOL_SQL = f"""
vols AS (
  SELECT s.s AS shard,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS v
  FROM unnest(range(0, {MD_D})) AS s(s)
  LEFT JOIN (
    SELECT doc_id % {MD_D} AS shard, COUNT(*) AS n
    FROM documents GROUP BY 1) c ON c.shard = s.s)
"""


def _lat(n: int) -> int:
    return 1 + _md5_64(f"lat:42:{n}") % 9


def _aff(s: int, n: int) -> int:
    return _md5_64(f"aff:42:{s}:{n}") % 1000


_LAT_EXPR = _md5u("'lat:42:' || CAST(w.w AS VARCHAR)")
_LAT_SQL = "1 + " + _LAT_EXPR + " % 9"
_AFF_EXPR = _md5u(
    "'aff:42:' || CAST(s.s AS VARCHAR) || ':' || CAST(w.w AS VARCHAR)"
)
_AFF_SQL = _AFF_EXPR + " % 1000"


# ==================================================== optimal_assignment
#
# cost(s, w) = v_s·latency(w) + affinity(s, w); find the permutation
# minimizing total cost, ties to the lexicographically smallest
# assignment vector. The Ray side solves it exactly (exhaustive over
# the bounded 8! domain — the Hungarian optimum with a brute
# certificate); the oracle enumerates the identical 8! space in SQL.
# Output: (shard, worker, cost) + the shared total.


def q_optimal_assignment(sf_dir: str):
    empty = pd.DataFrame(
        {
            "shard": pd.Series(dtype=np.int64),
            "worker": pd.Series(dtype=np.int64),
            "cost": pd.Series(dtype=np.int64),
            "total_cost": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    v = _shard_volumes(sf_dir)
    cost = np.empty((MD_D, MD_D), np.int64)
    for s in range(MD_D):
        for w in range(MD_D):
            cost[s, w] = int(v[s]) * _lat(w) + _aff(s, w)
    best = None
    for perm in permutations(range(MD_D)):
        c = int(sum(cost[s, perm[s]] for s in range(MD_D)))
        key = (c, perm)
        if best is None or key < best:
            best = key
    total, perm = best
    return pd.DataFrame(
        {
            "shard": np.arange(MD_D, dtype=np.int64),
            "worker": np.asarray(perm, np.int64),
            "cost": np.asarray(
                [cost[s, perm[s]] for s in range(MD_D)], np.int64
            ),
            "total_cost": np.full(MD_D, total, np.int64),
        }
    )


def _perm_sql_core() -> str:
    """8-way join enumerating all permutations with their cost."""
    sels = ", ".join(f"p{i}.w AS w{i}" for i in range(MD_D))
    froms = " CROSS JOIN ".join(
        f"(SELECT CAST(w.w AS BIGINT) AS w FROM unnest(range(0, {MD_D})) AS w(w)) p{i}"
        for i in range(MD_D)
    )
    diffs = " AND ".join(
        f"p{i}.w <> p{j}.w" for i in range(MD_D) for j in range(i + 1, MD_D)
    )
    costs = " + ".join(
        f"(SELECT cost FROM costs WHERE shard = {i} AND worker = p{i}.w)"
        for i in range(MD_D)
    )
    return f"""
perms AS (
  SELECT {sels}, CAST({costs} AS BIGINT) AS total
  FROM {froms}
  WHERE {diffs})"""


def _assignment_sql() -> str:
    order = ", ".join(f"w{i} ASC" for i in range(MD_D))
    unions = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS shard, b.w{i} AS worker, b.total "
        f"FROM best b"
        for i in range(MD_D)
    )
    return f"""
WITH {_VOL_SQL},
costs AS (
  SELECT s.s AS shard, w.w AS worker,
         CAST(vols.v * ({_LAT_SQL}) + ({_AFF_SQL}) AS BIGINT) AS cost
  FROM unnest(range(0, {MD_D})) AS s(s)
  CROSS JOIN unnest(range(0, {MD_D})) AS w(w)
  JOIN vols ON vols.shard = s.s),
{_perm_sql_core()},
best AS (
  SELECT * FROM perms ORDER BY total ASC, {order} LIMIT 1),
pick AS ({unions})
SELECT p.shard, p.worker, c.cost, p.total AS total_cost
FROM pick p JOIN costs c ON c.shard = p.shard AND c.worker = p.worker
"""


# ====================================================== stable_matching
#
# Queues (= shards) propose to workers. Queue q ranks workers by
# (md5('qp:42:q:w'), w); worker w ranks queues by (|v_q − cap_w|, q)
# with cap_w = a md5-derived capacity — the data-dependent side of
# the preferences. The Gale-Shapley proposer-optimal matching is
# simultaneously best for every proposer among stable matchings, so
# it equals the lexicographic-minimal (in proposer ranks) stable
# permutation — which is exactly how the oracle selects it from the
# enumerated 8! space. Output: (queue, worker, q_rank, w_rank).

def _qpref_key(q: int, w: int) -> tuple:
    return (_md5_64(f"qp:42:{q}:{w}"), w)


def _cap(w: int, vtot: int) -> int:
    return (_md5_64(f"cap:42:{w}") % (vtot + 1)) if vtot >= 0 else 0


def q_stable_matching(sf_dir: str):
    empty = pd.DataFrame(
        {
            "queue": pd.Series(dtype=np.int64),
            "worker": pd.Series(dtype=np.int64),
            "q_rank": pd.Series(dtype=np.int64),
            "w_rank": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    v = _shard_volumes(sf_dir)
    vtot = int(v.sum())
    # preference lists: qpref[q] = workers best-first; wrank[w][q]
    qpref = {
        q: sorted(range(MD_D), key=lambda w: _qpref_key(q, w))
        for q in range(MD_D)
    }
    wrank = {}
    for w in range(MD_D):
        cap = _cap(w, vtot)
        order = sorted(
            range(MD_D), key=lambda q: (abs(int(v[q]) - cap), q)
        )
        wrank[w] = {q: r for r, q in enumerate(order)}
    # Gale-Shapley, proposer = queue
    next_prop = [0] * MD_D
    engaged: dict[int, int] = {}  # worker -> queue
    free = list(range(MD_D))
    while free:
        q = free.pop(0)
        w = qpref[q][next_prop[q]]
        next_prop[q] += 1
        if w not in engaged:
            engaged[w] = q
        elif wrank[w][q] < wrank[w][engaged[w]]:
            free.append(engaged[w])
            engaged[w] = q
        else:
            free.append(q)
    rows = []
    for w, q in engaged.items():
        rows.append(
            (q, w, qpref[q].index(w), wrank[w][q])
        )
    return (
        pd.DataFrame(rows, columns=["queue", "worker", "q_rank", "w_rank"])
        .astype(np.int64)
        .sort_values("queue")
        .reset_index(drop=True)
    )


def _stable_sql() -> str:
    order = ", ".join(
        f"(SELECT qr FROM qrank WHERE q = {i} AND w = s.w{i}) ASC"
        for i in range(MD_D)
    )
    partner_of_q = (
        "CASE qw.q "
        + " ".join(f"WHEN {i} THEN p.w{i}" for i in range(MD_D))
        + " END"
    )
    queue_of_w = (
        "CASE qw.w "
        + " ".join(f"WHEN p.w{i} THEN {i}" for i in range(MD_D))
        + " END"
    )
    # blocking pair (q, w): q prefers w to its partner AND w prefers q
    # to ITS matched queue
    blocking = f"""EXISTS (
  SELECT 1
  FROM qrank qw
  JOIN qrank qp ON qp.q = qw.q AND qp.w = ({partner_of_q})
  JOIN wrank wq ON wq.w = qw.w AND wq.q = qw.q
  JOIN wrank wp ON wp.w = qw.w AND wp.q = ({queue_of_w})
  WHERE qw.qr < qp.qr AND wq.qr < wp.qr)"""
    unions = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS queue, s.w{i} AS worker FROM sel s"
        for i in range(MD_D)
    )
    return f"""
WITH {_VOL_SQL},
vtot AS (SELECT CAST(SUM(v) AS BIGINT) AS t FROM vols),
qrank AS (
  SELECT q.q, w.w,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.q
           ORDER BY {_md5u("'qp:42:' || CAST(q.q AS VARCHAR) || ':' || CAST(w.w AS VARCHAR)")}, w.w
         ) - 1 AS BIGINT) AS qr
  FROM unnest(range(0, {MD_D})) AS q(q)
  CROSS JOIN unnest(range(0, {MD_D})) AS w(w)),
wrank AS (
  SELECT w.w, q.q,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY w.w
           ORDER BY ABS(vols.v - CAST({_md5u("'cap:42:' || CAST(w.w AS VARCHAR)")} % (vtot.t + 1) AS BIGINT)), q.q
         ) - 1 AS BIGINT) AS qr
  FROM unnest(range(0, {MD_D})) AS w(w)
  CROSS JOIN unnest(range(0, {MD_D})) AS q(q)
  JOIN vols ON vols.shard = q.q, vtot),
{_perm_sql_stable()},
stable AS (
  SELECT * FROM perms p WHERE NOT ({blocking})),
sel AS (
  SELECT * FROM stable s ORDER BY {order} LIMIT 1),
pick AS ({unions})
SELECT p.queue, p.worker,
       (SELECT qr FROM qrank WHERE q = p.queue AND w = p.worker) AS q_rank,
       (SELECT qr FROM wrank WHERE w = p.worker AND q = p.queue) AS w_rank
FROM pick p
"""


def _perm_sql_stable() -> str:
    sels = ", ".join(f"p{i}.w AS w{i}" for i in range(MD_D))
    froms = " CROSS JOIN ".join(
        f"(SELECT CAST(w.w AS BIGINT) AS w FROM unnest(range(0, {MD_D})) AS w(w)) p{i}"
        for i in range(MD_D)
    )
    diffs = " AND ".join(
        f"p{i}.w <> p{j}.w" for i in range(MD_D) for j in range(i + 1, MD_D)
    )
    return f"""perms AS (
  SELECT {sels} FROM {froms} WHERE {diffs})"""


# ================================================== top_trading_cycles
#
# Each agent a initially owns shard a; preference over shards is
# (|v_s − ideal_a|, s) with ideal_a md5-derived from the total
# volume. TTC: every remaining agent points at the owner of its
# favourite remaining shard; agents on pointer cycles trade and
# leave; repeat (≤ D rounds). Output: (agent, shard, round) — the
# unique core allocation.


def _ideal(a: int, vtot: int) -> int:
    return _md5_64(f"tp:42:{a}") % (vtot + 1)


def q_top_trading_cycles(sf_dir: str):
    empty = pd.DataFrame(
        {
            "agent": pd.Series(dtype=np.int64),
            "shard": pd.Series(dtype=np.int64),
            "round": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    v = _shard_volumes(sf_dir)
    vtot = int(v.sum())

    def pref(a: int, shards) -> int:
        ideal = _ideal(a, vtot)
        return min(shards, key=lambda s: (abs(int(v[s]) - ideal), s))

    remaining = set(range(MD_D))
    alloc = {}
    rnd = 0
    while remaining:
        rnd += 1
        # pointer graph: a -> owner(favourite(a)) = favourite(a)
        ptr = {a: pref(a, remaining) for a in remaining}
        # agents on cycles
        on_cycle = set()
        for a in remaining:
            seen = a
            for _ in range(MD_D):
                seen = ptr[seen]
                if seen == a:
                    on_cycle.add(a)
                    break
        for a in on_cycle:
            alloc[a] = (ptr[a], rnd)
        remaining -= on_cycle
    rows = [(a, s, r) for a, (s, r) in sorted(alloc.items())]
    return pd.DataFrame(rows, columns=["agent", "shard", "round"]).astype(
        np.int64
    )


def _ttc_sql() -> str:
    ideal = _md5u("'tp:42:' || CAST(a.a AS VARCHAR)")
    parts = [
        f"""WITH {_VOL_SQL.replace("vols AS (", "vols AS MATERIALIZED (")},
vtot AS MATERIALIZED (SELECT CAST(SUM(v) AS BIGINT) AS t FROM vols),
pk AS MATERIALIZED (
  SELECT a.a, vols.shard AS s,
         ABS(vols.v - CAST({ideal} % (vtot.t + 1) AS BIGINT)) AS d
  FROM unnest(range(0, {MD_D})) AS a(a)
  CROSS JOIN vols, vtot),
rem0 AS (SELECT CAST(a.a AS BIGINT) AS a FROM unnest(range(0, {MD_D})) AS a(a))"""
    ]
    for r in range(1, MD_D + 1):
        # walk powers g1..g8 via composition; a is on a cycle iff any
        # of the 8 hop counts returns to a
        hop_ctes = "\n".join(
            f"g{k}_{r} AS MATERIALIZED (SELECT a.a, b.p FROM g{k - 1}_{r} a "
            f"JOIN g1_{r} b ON b.a = a.p),"
            for k in range(2, MD_D + 1)
        )
        self_hits = "\n     OR ".join(
            f"EXISTS (SELECT 1 FROM g{k}_{r} x "
            f"WHERE x.a = g1_{r}.a AND x.p = g1_{r}.a)"
            for k in range(1, MD_D + 1)
        )
        parts.append(
            f"""fav{r} AS MATERIALIZED (
  SELECT a, s FROM (
    SELECT rem{r - 1}.a, pk.s,
           ROW_NUMBER() OVER (PARTITION BY rem{r - 1}.a
                              ORDER BY pk.d ASC, pk.s ASC) AS rn
    FROM rem{r - 1}
    JOIN pk ON pk.a = rem{r - 1}.a
    WHERE pk.s IN (SELECT a FROM rem{r - 1})) WHERE rn = 1),
g1_{r} AS MATERIALIZED (SELECT a, s AS p FROM fav{r}),
{hop_ctes}
cyc{r} AS MATERIALIZED (
  SELECT g1_{r}.a, g1_{r}.p AS s
  FROM g1_{r}
  WHERE {self_hits}),
rem{r} AS MATERIALIZED (
  SELECT a FROM rem{r - 1} WHERE a NOT IN (SELECT a FROM cyc{r}))"""
        )
    unions = " UNION ALL ".join(
        f"SELECT a AS agent, s AS shard, CAST({r} AS BIGINT) AS round "
        f"FROM cyc{r}"
        for r in range(1, MD_D + 1)
    )
    parts.append(f"alloc AS ({unions})\nSELECT agent, shard, round FROM alloc")
    head = ",\n".join(parts[:-1])
    return head + ",\n" + parts[-1]


MECHDESIGN_SQL_QUERIES: dict[str, tuple] = {
    "optimal_assignment": (q_optimal_assignment, _assignment_sql()),
    "stable_matching": (q_stable_matching, _stable_sql()),
    "top_trading_cycles": (q_top_trading_cycles, _ttc_sql()),
}
