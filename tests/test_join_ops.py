"""Bloom-prefiltered semi join: filter primitives (no false negatives,
vectorized probe), end-to-end exactness incl. false-positive removal by
the confirm stage, and the bounded driver reduce. Oracle parity is
covered by the gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from europarl_crawler_ray.pipelines.join_ops import (
    _N_WORDS,
    _set_bits,
    _test_bits,
    q_bloom_filter_join,
)


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.RandomState(7)
    members = rng.randint(0, 2**62, size=20_000).astype(np.int64)
    others = rng.randint(0, 2**62, size=20_000).astype(np.int64)
    others = np.setdiff1d(others, members)
    bitmap = np.zeros(_N_WORDS, dtype=np.uint64)
    _set_bits(bitmap, members)
    assert _test_bits(bitmap, members).all()  # zero false negatives
    fp = _test_bits(bitmap, others).mean()
    # m=2^20 bits, n=20k, k=4 -> theoretical fp ~ (1-e^(-kn/m))^4 ~ 3e-5
    assert fp < 0.01


def _write_tables(path, orders_rows, lineitem_rows):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
                "o_custkey": pa.array([0] * len(orders_rows), pa.int64()),
                "o_orderstatus": pa.array([r[1] for r in orders_rows]),
                "o_totalprice": pa.array([0.0] * len(orders_rows)),
                "o_orderdate": pa.array([None] * len(orders_rows), pa.timestamp("us")),
                "o_orderpriority": pa.array([""] * len(orders_rows)),
            }
        ),
        path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lineitem_rows], pa.int64()),
                "l_returnflag": pa.array([r[1] for r in lineitem_rows]),
                "l_quantity": pa.array([float(r[2]) for r in lineitem_rows]),
            }
        ),
        path / "lineitem.parquet",
    )


def test_join_exact_despite_bloom(ray_session, tmp_path):
    # orders 1..200 qualify ('F'); 201..400 do not. lineitems reference
    # both sides plus keys that never existed (must all be dropped).
    orders = [(i, "F") for i in range(1, 201)] + [(i, "O") for i in range(201, 401)]
    li = (
        [(i, "A", 2) for i in range(1, 201)]          # all match
        + [(i, "R", 3) for i in range(201, 401)]      # status excluded
        + [(i, "N", 5) for i in range(1000, 1100)]    # nonexistent keys
    )
    _write_tables(tmp_path, orders, li)
    df = (
        q_bloom_filter_join(str(tmp_path))
        .to_pandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert list(df.index) == ["A"]
    assert df.loc["A", "n_items"] == 200
    assert df.loc["A", "sum_qty"] == 400


def test_join_no_qualifying_orders(ray_session, tmp_path):
    _write_tables(tmp_path, [(1, "O")], [(1, "A", 1)])
    res = q_bloom_filter_join(str(tmp_path))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == 0
    assert set(df.columns) == {"l_returnflag", "n_items", "sum_qty"}
