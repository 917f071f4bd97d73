"""Pure range join: bucket-boundary replication must be exact — windows
crossing a time-bucket edge, probes at the exact window bounds, and
double-count hazards when both anchor copies land in one coarse group."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.queries import RANGE_JOIN_US, q_range_join

US = 1_000_000


def _write_events(tmp_path, ts_us, types, values):
    n = len(ts_us)
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def _brute(ts_us, types, values):
    cents = np.floor(np.asarray(values) * 100).astype(np.int64)
    rows = {}
    for a, (at, ty) in enumerate(zip(ts_us, types)):
        if ty != "purchase":
            continue
        m = [(b, bt) for b, bt in enumerate(ts_us) if at <= bt < at + RANGE_JOIN_US]
        rows[a] = (len(m), int(sum(cents[b] for b, _ in m)))
    return rows


@pytest.mark.usefixtures("ray_session")
def test_range_join_boundaries(tmp_path):
    W = RANGE_JOIN_US
    base = 7 * W + W // 2  # anchor mid-bucket: window spans buckets 7 and 8
    ts = [
        base,            # 0 anchor (self-matches)
        base + W - 1,    # 1 last us inside the window (bucket 8)
        base + W,        # 2 exactly at the exclusive end -> OUT
        base - 1,        # 3 just before the anchor -> OUT
        base,            # 4 equal ts to the anchor -> IN
        8 * W,           # 5 exactly on the bucket edge inside the window -> IN
        0,               # 6 anchor far in the past, own window
    ]
    types = ["purchase", "view", "view", "view", "click", "view", "purchase"]
    values = [1.10, 2.25, 4.0, 8.0, 16.5, 32.01, 64.99]
    _write_events(tmp_path, ts, types, values)
    out = q_range_join(str(tmp_path)).to_pandas().set_index("event_id")
    expected = _brute(ts, types, values)
    got = {i: (int(r["n_in_window"]), int(r["sum_cents"])) for i, r in out.iterrows()}
    assert got == expected
    # the cross-bucket window really did pick up bucket-8 probes
    assert got[0][0] == 4  # self, +W-1, equal-ts, bucket-edge


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_brute_force_random(tmp_path):
    rng = np.random.RandomState(7)
    n = 300
    ts = np.sort(rng.randint(0, 30 * RANGE_JOIN_US, size=n)).tolist()
    types = rng.choice(["purchase", "view", "click"], size=n).tolist()
    values = np.round(rng.uniform(0, 100, size=n), 4).tolist()
    _write_events(tmp_path, ts, types, values)
    out = q_range_join(str(tmp_path)).to_pandas()
    got = {
        i: (int(a), int(b))
        for i, a, b in zip(out["event_id"], out["n_in_window"], out["sum_cents"])
    }
    assert got == _brute(ts, types, values)
