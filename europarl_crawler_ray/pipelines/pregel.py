"""Shared Pregel-style round loop for the iterative graph operators.

``q_dedup_clusters`` (min-label components), ``q_link_depth`` (BFS) and
``q_kcore_peel`` (degeneracy peeling) all iterate the same skeleton: a
bucketed state+message stream, one ``groupby(bucket).map_groups(step)``
exchange per round, a materialize so the next round reads blocks instead
of re-running the chain, and a convergence scalar. Before this helper
each loop paid a SECOND executor pass per round (``stream.sum(col)``
over the whole materialized stream) just to read that scalar
(VERDICT r3 #3).

Here the convergence count rides OUT of the exchange itself: the group
fn's output already carries the change flags, so a wrapper sums the flag
column per task and reports it to a zero-CPU counter actor with a
BLOCKING ``ray.get`` — when ``materialize()`` returns, every task's count
has been applied and the driver reads one actor scalar instead of
launching a scan. Retry safety: map tasks are at-least-once, so a
retried task can only ADD to a round's count — it can never turn a
truly-converged round (every task reports 0) into a nonzero one, and the
loop only ever compares the count to zero.

The residual partitioning assumption is the same as before: one bucket's
state must fit a task (buckets are coarse, ``n_buckets`` ≥ core count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


@ray.remote(num_cpus=0)
class _RoundCounter:
    """Per-round change-count accumulator (driver-read once per round)."""

    def __init__(self):
        self.counts: dict[int, int] = {}

    def add(self, round_idx: int, n: int) -> None:
        self.counts[round_idx] = self.counts.get(round_idx, 0) + int(n)

    def get(self, round_idx: int) -> int:
        return self.counts.get(round_idx, 0)


def pregel_loop(
    stream: ray.data.Dataset,
    make_step,
    *,
    key: str = "bucket",
    changed_col: str,
    max_iters: int,
    batch_format: str = "pandas",
):
    """Run ``stream`` through up to ``max_iters`` bucket-exchange rounds.

    ``make_step(i)`` returns the round's group fn (pandas DataFrame or
    pyarrow Table out); the fn's output must carry ``changed_col`` whose
    global sum is the round's convergence scalar (0 = fixed point).
    Returns ``(stream, converged, last_count)`` — callers own the
    not-converged warning (each has an operator-specific message).

    STATUS: the restartable FALLBACK engine. Every shipped iterative
    operator runs on ``pregel_actor_loop`` below (edges resident, only
    messages move); this Dataset-round loop is kept because each of its
    rounds is lineage-backed (a lost task replays instead of failing the
    query) — the trade a long unattended run may prefer. Its contract is
    pinned by tests/test_pregel.py.
    """
    counter = _RoundCounter.remote()
    converged = False
    last = 0
    for i in range(max_iters):
        fn = make_step(i)

        def wrapped(g, _fn=fn, _i=i):
            out = _fn(g)
            if isinstance(out, pa.Table):
                n = pc.sum(out.column(changed_col)).as_py() or 0
            else:
                n = out[changed_col].sum()
                n = 0 if pd.isna(n) else int(n)
            # blocking: the task only finishes after the actor applied the
            # count, so post-materialize the round total is complete
            ray.get(counter.add.remote(_i, int(n)))
            return out

        stream = (
            stream.groupby(key)
            .map_groups(wrapped, batch_format=batch_format)
            .materialize()
        )
        last = ray.get(counter.get.remote(i))
        if last == 0:
            converged = True
            break
    return stream, converged, last


# ===================== actor-resident engine (edges never re-shuffled)
#
# The Dataset-based pregel_loop above re-exchanges the WHOLE state
# stream (edges + labels + messages) through a groupby sort every
# round; at bench scale each round pays ~1-2 s of executor/sort fixed
# cost, and at 100 TB the edge set — which never changes — crosses the
# wire rounds× times. This engine loads each bucket's state into a
# persistent actor ONCE; per round only MESSAGES move, as pyarrow
# tables through the object store (zero-copy reads), and the round
# barrier is a plain ray.get over the step futures.
#
# Partitioning assumption (same as the Dataset path, now explicit
# memory-wise): one actor's bucket share of the state must fit its
# heap. Fault story: actors are not restartable mid-run (state is
# round-mutated); a lost actor fails the query and the caller re-runs —
# the 100 TB deployment would checkpoint per-round state per bucket
# exactly like state/seen.py shards checkpoint.


@ray.remote(num_cpus=0)
class _BucketActor:
    """Owns every state row whose bucket id ≡ actor id (mod n_actors).

    num_cpus=0: rounds run all actors concurrently as a BSP wave;
    reserving a CPU per actor would deadlock small sessions (the
    measured 8-CPU oracle-gate trap) — oversubscription is bounded by
    one step call per actor per round."""

    def __init__(self, actor_id: int, n_actors: int, step_fn, key: str):
        self.id = actor_id
        self.n = n_actors
        self.step_fn = step_fn
        self.key = key
        self.parts: list = []
        self.state = None

    def load(self, table: pa.Table) -> int:
        # routing happens sender-side (the seed route() splits each block
        # by owner), so every arriving part belongs to this actor whole
        self.parts.append(table)
        return table.num_rows

    def has_state(self) -> bool:
        self._consolidate()
        return self.state is not None and len(self.state) > 0

    def _consolidate(self):
        if self.state is None:
            self.state = (
                pa.concat_tables(self.parts).to_pandas()
                if self.parts
                else None
            )
            self.parts = []

    def step(self, round_i: int, msg_refs: list):
        self._consolidate()
        import pandas as _pd

        # zero-copy plasma reads; every actor scans all outboxes and
        # keeps its rows (sender-side splitting would cut this B× read
        # amplification — messages are the small stream, so the scan is
        # cheap relative to what staying out of the round exchange saves)
        inbox = [t for t in (ray.get(r) for r in msg_refs) if t is not None]
        mine = [t.to_pandas() for t in inbox if t.num_rows]
        msgs = None
        if mine:
            msgs = _pd.concat(mine, ignore_index=True)
            msgs = msgs[(msgs[self.key].to_numpy() % self.n) == self.id]
        state, out_msgs, n_changed = self.step_fn(
            self.id, self.n, self.state, msgs, round_i
        )
        self.state = state
        out = (
            pa.Table.from_pandas(out_msgs, preserve_index=False)
            if out_msgs is not None and len(out_msgs)
            else None
        )
        return out, int(n_changed)

    def collect(self) -> pa.Table:
        self._consolidate()
        return pa.Table.from_pandas(self.state, preserve_index=False)


@ray.remote
def _route_block(block, actors, key: str, n_actors: int):
    """Split one seed block by owner and push the parts (blocking acks —
    when this task returns, its loads are applied)."""
    t = (
        block
        if isinstance(block, pa.Table)
        else pa.Table.from_pandas(block, preserve_index=False)
    )
    if t.num_rows == 0:
        return 0
    b = pc.cast(t.column(key), pa.int64()).to_numpy(zero_copy_only=False)
    owner = b % n_actors
    acks = []
    for a_id in np.unique(owner):
        part = t.filter(pa.array(owner == a_id))
        acks.append(actors[a_id].load.remote(part))
    ray.get(acks)
    return t.num_rows


def pregel_actor_loop(
    seed: ray.data.Dataset,
    step_fn,
    *,
    key: str,
    max_iters: int,
    n_actors: int = 16,
):
    """BSP rounds over actor-resident state. ``seed`` rows carry the
    bucket column ``key``; each row loads once into the actor owning
    ``row[key] % n_actors``. ``step_fn(actor_id, n_actors, state_df,
    msgs_df, round_i) -> (state_df, out_msgs_df | None, n_changed)``;
    outgoing messages carry ``key`` (any bucket id — the engine routes
    by ``% n_actors``). Returns ``(final_state_dataset, converged,
    last_count)`` with the final state re-exposed as a Dataset via
    ``from_arrow_refs`` — it never touches the driver."""
    actors = [
        _BucketActor.remote(i, n_actors, step_fn, key) for i in range(n_actors)
    ]

    # Loading must be EXACTLY-once: a map-task side effect would double-
    # load its block if Ray's at-least-once retry re-ran it (review
    # finding — sum-style steps like pagerank silently double). So the
    # seed materializes first (pure, retry-safe), and the loads run as
    # max_retries=0 tasks over the materialized block refs — a lost
    # loader fails the query loudly instead of corrupting state.
    seed_blocks = []
    for bundle in seed.materialize().iter_internal_ref_bundles():
        seed_blocks.extend(bundle.block_refs)
    ray.get(
        [
            _route_block.options(max_retries=0).remote(blk, actors, key, n_actors)
            for blk in seed_blocks
        ]
    )

    converged, last = False, 0
    msg_refs: list = []
    try:
        for i in range(max_iters):
            futs = [
                a.step.options(num_returns=2).remote(i, msg_refs)
                for a in actors
            ]
            # only the scalar counts reach the driver; outbox tables stay
            # in the object store and flow ref-only into the next round
            counts = ray.get([f[1] for f in futs])
            msg_refs = [f[0] for f in futs]
            last = int(sum(counts))
            if last == 0:
                converged = True
                break
        # final state: ref-only hand-off into a Dataset — the driver
        # fetches nothing data-scaled (only the has_state booleans)
        with_state = [
            a for a, h in zip(actors, ray.get([a.has_state.remote() for a in actors])) if h
        ]
        final_refs = [a.collect.remote() for a in with_state]
        if final_refs:
            # identity map forces fresh task-owned blocks so the output
            # survives the actor kill below (plasma objects are node-
            # local; re-owning them keeps lineage reconstructable too)
            out_ds = (
                ray.data.from_arrow_refs(final_refs)
                .map_batches(lambda t: t, batch_format="pyarrow")
                .materialize()
            )
        else:
            out_ds = None
    finally:
        for a in actors:
            ray.kill(a)
    return out_ds, converged, last
