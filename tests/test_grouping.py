"""Coarse-group co-location helper (pipelines/grouping.py)."""

import numpy as np
import pyarrow as pa
import pytest

from europarl_crawler_ray.pipelines.grouping import N_COARSE_GROUPS, with_coarse_group


@pytest.mark.usefixtures("ray_session")
def test_same_key_same_group_even_with_nulls():
    """Null-stability (review finding): a nullable int column realizes as
    float64/object numpy depending on the batch's null placement; the
    hash must not depend on that."""
    import ray.data

    t_clean = pa.table({"k": pa.array([5, 7, 9], pa.int64())})
    t_nully = pa.table({"k": pa.array([5, None, 9], pa.int64())})
    ds = ray.data.from_arrow([t_clean, t_nully])
    out = with_coarse_group(ds, "k").to_pandas()
    by_key = out.dropna(subset=["k"]).groupby("k")["_g"].nunique()
    assert (by_key == 1).all(), out

    assert out["_g"].between(0, N_COARSE_GROUPS - 1).all()


@pytest.mark.usefixtures("ray_session")
def test_string_keys_supported():
    import ray.data

    t = pa.table({"k": pa.array(["a", "b", "a", None], pa.string())})
    ds = ray.data.from_arrow(t)
    out = with_coarse_group(ds, "k").to_pandas()
    a_groups = out[out["k"] == "a"]["_g"].nunique()
    assert a_groups == 1
