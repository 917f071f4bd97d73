"""Scale-design guards for the join queries: the driver must never
materialize a data-scaled table (VERDICT r2 #1)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.queries import (
    NATION_ORDER_STATS_SQL,
    q_nation_order_stats,
)


def test_nation_order_stats_matches_duckdb(ray_session, sf_dir):
    got = q_nation_order_stats(sf_dir).to_pandas().sort_values("n_name").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(NATION_ORDER_STATS_SQL).df().sort_values("n_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nation_order_stats_never_collects_orders_on_driver(ray_session, sf_dir, monkeypatch):
    """The only driver-side collects allowed are the bounded dimensions
    (customer, nation) — never orders/lineitem (data-scaled)."""
    import ray.data

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_customer = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    assert n_orders > n_customer  # the guard below is meaningful

    collected = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **kw):
        df = orig(self, *a, **kw)
        collected.append(len(df))
        return df

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    out = q_nation_order_stats(sf_dir)
    # driver-side collects happen during query CONSTRUCTION (broadcast
    # prep); executing the result is allowed to collect the ≤25-row answer
    assert collected, "expected the small-dimension broadcast collects"
    assert max(collected) <= n_customer, (
        f"driver collected a table of {max(collected)} rows — data-scaled "
        f"(orders={n_orders}); only bounded dimensions may be collected"
    )
    assert out.count() > 0


def test_nation_order_stats_broadcast_is_dimension_sized(ray_session, sf_dir, monkeypatch):
    """ray.put payloads during construction must be dimension-sized, not
    orders-sized (the r2 version shipped every o_orderkey)."""
    import ray

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_customer = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    sizes = []
    orig_put = ray.put

    def spy_put(obj, *a, **kw):
        n = 0
        if isinstance(obj, tuple):
            n = max((len(x) for x in obj if isinstance(x, np.ndarray)), default=0)
        elif isinstance(obj, np.ndarray):
            n = len(obj)
        sizes.append(n)
        return orig_put(obj, *a, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    q_nation_order_stats(sf_dir)
    assert sizes and max(sizes) <= n_customer < n_orders


def test_dedup_verify_never_collects_on_driver(ray_session, sf_dir, monkeypatch):
    """VERDICT r2 #2: neither the candidate pairs nor any shingle set may
    be collected to the driver during query construction."""
    import ray.data

    from europarl_crawler_ray.pipelines.ml_queries import q_dedup_verify

    def boom(self, *a, **kw):
        raise AssertionError("driver-side to_pandas during dedup_verify construction")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    ds = q_dedup_verify(sf_dir)  # construction must not collect
    monkeypatch.undo()
    out = ds.to_pandas()
    assert list(sorted(out.columns)) == ["doc_a", "doc_b", "n_inter", "n_union"]
    assert (out["n_union"] >= out["n_inter"]).all()


def test_dedup_verify_matches_duckdb(ray_session, sf_dir):
    from europarl_crawler_ray.pipelines.ml_queries import DEDUP_VERIFY_SQL, q_dedup_verify

    got = (
        q_dedup_verify(sf_dir)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(DEDUP_VERIFY_SQL).df().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_todo_combos_empty_confirmed_days(ray_session, tmp_path):
    """Review finding: an events table with no 200-status events must
    yield an empty result, not an IndexError on the empty conf array."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.queries import _status_np, q_todo_combos

    # pick event_ids whose derived status is never 200
    ids = np.arange(0, 200_000, dtype=np.int64)
    bad = ids[_status_np(ids) != 200][:500]
    assert len(bad) == 500
    t = pa.table(
        {
            "event_id": pa.array(bad, pa.int64()),
            "ts": pa.array(
                pd.date_range("2021-01-01", periods=len(bad), freq="min")
            ),
            "user_id": pa.array(np.arange(len(bad)) % 7, pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = q_todo_combos(str(d)).to_pandas()
    assert len(out) == 0
