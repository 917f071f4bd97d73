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
