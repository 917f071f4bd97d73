"""Tests for pipelines/validation_ops.py — constraint suites,
temperature mixing, CUBE rollups, per-group linreg, Adamic-Adar,
readability, compaction planning. Each op is pinned against its own
DuckDB oracle in-repo (repo convention: pytest alone must catch a
divergence, independent of the driver's query sampling)."""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from europarl_crawler_ray.pipelines.validation_ops import (
    COMPACT_TARGET_BYTES,
    MIX_TOTAL_CAP,
    _AA_W,
    _mix_targets,
    q_compaction_plan,
    q_constraint_check,
    q_temperature_mix,
)


class TestOracleParity:
    NAMES = [
        "constraint_check",
        "temperature_mix",
        "linreg_fit",
        "adamic_adar",
        "readability",
        "cube_stats",
        "compaction_plan",
    ]

    def test_oracle_parity(self, ray_session, sf_dir):
        import duckdb

        from check_oracles import TABLES, compare, to_pandas

        import __ray_entry__ as entry

        qs, sqls = entry.queries(), entry.oracle_sql()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in self.NAMES:
            ray_df = to_pandas(qs[name](sf_dir))
            sql_df = con.execute(sqls[name]).fetchdf()
            assert compare(name, ray_df, sql_df) == [], name


class TestMixTargets:
    """The largest-remainder apportionment is pure int arithmetic; pin
    its invariants so a refactor can't silently change the mixture."""

    def test_sums_to_total(self):
        counts = {"de": 900, "en": 2500, "fr": 400, "pl": 49, "es": 151}
        t = _mix_targets(counts, 1000)
        assert sum(t.values()) == 1000

    def test_sqrt_flattening(self):
        # temperature alpha=0.5 must compress the head: en has 25x the
        # docs of pl but only sqrt(25)=5x the target (within rounding)
        counts = {"en": 2500, "pl": 100}
        t = _mix_targets(counts, 600)
        assert t["en"] == 500 and t["pl"] == 100

    def test_deterministic_tiebreak(self):
        # equal counts, odd total: the leftover unit goes to the
        # lexicographically-first language
        t = _mix_targets({"aa": 100, "bb": 100, "cc": 100}, 100)
        assert sum(t.values()) == 100
        assert t["aa"] >= t["bb"] >= t["cc"]

    def test_zero_counts(self):
        assert _mix_targets({"xx": 0, "yy": 0}, 10) == {"xx": 0, "yy": 0}


class TestTemperatureMix:
    def test_respects_targets_and_cap(self, ray_session, sf_dir):
        out = q_temperature_mix(sf_dir)
        assert len(out) <= MIX_TOTAL_CAP
        # per-language sample sizes equal the apportionment targets
        # (capped by language size)
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        counts = docs["lang"].value_counts().to_dict()
        targets = _mix_targets(counts, min(MIX_TOTAL_CAP, len(docs)))
        got = out["lang"].value_counts().to_dict()
        for lang, tgt in targets.items():
            assert got.get(lang, 0) == min(tgt, counts.get(lang, 0)), lang

    def test_no_duplicate_docs(self, ray_session, sf_dir):
        out = q_temperature_mix(sf_dir)
        assert out["doc_id"].is_unique


class TestConstraintCheck:
    def test_matches_pandas_ground_truth(self, ray_session, sf_dir):
        out = q_constraint_check(sf_dir).set_index("check_name")
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
        n = len(orders)
        assert (out["n_rows"] == n).all()
        assert (
            out.loc["uniqueness_orderkey", "n_violations"]
            == n - orders["o_orderkey"].nunique()
        )
        cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        assert out.loc["range_totalprice_le_400k", "n_violations"] == int(
            (cents > 40_000_000).sum()
        )
        # status 'pass' iff zero violations
        assert (
            (out["n_violations"] == 0) == (out["status"] == "pass")
        ).all()


class TestCompactionPlan:
    def test_bins_respect_target_packing(self, ray_session, sf_dir):
        out = q_compaction_plan(sf_dir)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        # within each source, re-derive bins from the size-DESC prefix
        # sum and check the distributed result matches exactly
        for src, g in out.groupby("source"):
            g = g.sort_values(["size_bytes", "doc_id"], ascending=[False, True])
            cum = g["size_bytes"].cumsum().to_numpy()
            want = (cum - g["size_bytes"].to_numpy()) // COMPACT_TARGET_BYTES
            assert (g["bin"].to_numpy() == want).all(), src
        # bins are dense from 0 per source
        for src, g in out.groupby("source"):
            assert g["bin"].min() == 0


class TestAAWeights:
    def test_scaled_int_literals(self):
        for d, w in _AA_W.items():
            assert w == round(1e6 / math.log(d))


# ------------------------------------------------------- k-anonymity audit


def test_k_anon_audit_matches_bruteforce(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.validation_ops import (
        KANON_K,
        _KANON_SHIFT,
        q_k_anon_audit,
    )

    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(n)],
            "c_nationkey": rng.randint(0, 4, n).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999.99, 3000, n), 2),
            "c_mktsegment": rng.choice(["A", "B"], n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "customer.parquet")
    got = q_k_anon_audit(str(tmp_path))
    cents = np.floor(df["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    ref = (
        df.assign(bal_band=(cents + _KANON_SHIFT) // 100_000)
        .groupby(["c_nationkey", "c_mktsegment", "bal_band"], as_index=False)
        .size()
    )
    ref = ref[ref["size"] < KANON_K]
    want = {
        (int(r.c_nationkey), r.c_mktsegment, int(r.bal_band)): int(r.size)
        for r in ref.itertuples()
    }
    have = {
        (int(r.c_nationkey), r.c_mktsegment, int(r.bal_band)): int(r.n)
        for r in got.itertuples()
    }
    assert have == want
    assert all(v < KANON_K for v in have.values())


def test_k_anon_negative_band_floor_semantics(ray_session, tmp_path):
    # -0.01 and +0.01 must land in DIFFERENT bands iff the shifted-cents
    # floor says so (the truncate-vs-floor trap the shift removes):
    # band(-0.01) = (10^7 - 1)//10^5 = 99, band(+0.01) = 100
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.validation_ops import q_k_anon_audit

    df = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [0, 0],
            "c_acctbal": [-0.01, 0.01],
            "c_mktsegment": ["A", "A"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "customer.parquet")
    got = q_k_anon_audit(str(tmp_path))
    assert sorted(got["bal_band"]) == [99, 100]
    assert (got["n"] == 1).all()


# --------------------------------------------------------- EWMA smoothing


def test_ewma_matches_straight_line(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.validation_ops import (
        EWMA_SCALE,
        q_ewma_forecast,
    )

    rng = np.random.RandomState(9)
    days = pd.date_range("2024-03-01", periods=12, freq="D")
    rows = []
    for i, d in enumerate(days):
        for typ, lam in (("click", 20), ("view", 5)):
            for j in range(rng.poisson(lam)):
                rows.append((len(rows), d + pd.Timedelta(minutes=j), 1, typ, 0.0, "{}"))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = q_ewma_forecast(str(tmp_path))
    for typ in ("click", "view"):
        g = got[got["event_type"] == typ].sort_values("day_idx")
        counts = (
            df[df["event_type"] == typ]
            .groupby(df["ts"].dt.floor("D"))
            .size()
            .reindex(days, fill_value=0)
            .to_numpy()
        )
        assert list(g["n_events"]) == list(counts)
        s = counts[0] * EWMA_SCALE
        want = [s]
        for c in counts[1:]:
            s = (3 * s + c * EWMA_SCALE) // 4
            want.append(s)
        assert list(g["ewma_milli"]) == want
    # steady-state sanity: EWMA converges toward the mean rate ×1000
    click = got[got["event_type"] == "click"]
    assert abs(int(click["ewma_milli"].iloc[-1]) - 20000) < 12000
