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
