"""Tests for the round-5 batch-5 operators: truss_support
(webgraph_ops), conformal_coverage (validation_ops), ab_test_stats
(corpus_ops), jl_distortion (sketcheval_ops) — DuckDB-oracle parity at
sf0.001 plus brute-force checks of the support counts, the order
statistic, the 2×2 chi-square, and the sign-projection arithmetic on
hand-built inputs."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.corpus_ops import (
    AB_TEST_STATS_SQL,
    q_ab_test_stats,
)
from europarl_crawler_ray.pipelines.sketcheval_ops import (
    JL_DISTORTION_SQL,
    JL_K,
    _jl_signs,
    q_jl_distortion,
)
from europarl_crawler_ray.pipelines.validation_ops import (
    CONF_ALPHA_BP,
    CONF_CAL_MOD,
    CONFORMAL_COVERAGE_SQL,
    q_conformal_coverage,
)
from europarl_crawler_ray.pipelines.webgraph_ops import (
    TRUSS_SUPPORT_SQL,
    q_truss_support,
)
from europarl_crawler_ray.stages.multimodal import _md5_64


def _write_docs(d, rows):
    """rows: list of (text, lang, source)."""
    texts = [r[0] for r in rows]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _write_emb(d, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def _write_events(d, rows):
    """rows: list of (user_id, event_type)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))],
                               pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


class TestOracleParityBatch5:
    def test_parity(self, ray_session, sf_dir):
        from check_oracles import TABLES, compare, to_pandas

        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name, fn, sql in [
            ("truss_support", q_truss_support, TRUSS_SUPPORT_SQL),
            ("conformal_coverage", q_conformal_coverage, CONFORMAL_COVERAGE_SQL),
            ("ab_test_stats", q_ab_test_stats, AB_TEST_STATS_SQL),
            ("jl_distortion", q_jl_distortion, JL_DISTORTION_SQL),
        ]:
            ray_df = to_pandas(fn(sf_dir))
            sql_df = con.execute(sql).fetchdf()
            assert compare(name, ray_df, sql_df) == [], name


class TestTrussSupport:
    def test_brute_force_small(self, ray_session, tmp_path):
        from europarl_crawler_ray.pipelines.queries import internal_edges_np

        n = 30
        _write_docs(tmp_path, [(f"doc {i}", "en", "s0") for i in range(n)])
        out = q_truss_support(str(tmp_path)).to_pandas()
        src, dst = internal_edges_np(np.arange(n), n, drop_self=True)
        edges = {
            (int(min(a, b)), int(max(a, b))) for a, b in zip(src, dst)
        }
        nbrs: dict[int, set] = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        want = {
            (u, v): len(nbrs[u] & nbrs[v]) for u, v in edges
        }
        got = {
            (int(r["u"]), int(r["v"])): int(r["support"])
            for _, r in out.iterrows()
        }
        assert got == want
        # sanity: at least one triangle exists in this synthetic graph
        assert any(s > 0 for s in want.values())

    def test_support_is_truss_consistent(self, ray_session, sf_dir):
        # every edge's support is bounded by min(deg(u), deg(v)) - 1
        out = q_truss_support(sf_dir).to_pandas()
        deg: dict[int, int] = {}
        for _, r in out.iterrows():
            deg[int(r["u"])] = deg.get(int(r["u"]), 0) + 1
            deg[int(r["v"])] = deg.get(int(r["v"]), 0) + 1
        for _, r in out.iterrows():
            u, v, s = int(r["u"]), int(r["v"]), int(r["support"])
            assert s <= min(deg[u], deg[v]) - 1 + 1  # ≤ min degree


class TestConformalCoverage:
    def test_order_statistic(self, ray_session, tmp_path):
        rows = [("x" * (10 + 7 * i % 40), "en", "s0") for i in range(60)]
        _write_docs(tmp_path, rows)
        out = q_conformal_coverage(str(tmp_path))
        scores = np.array([len(r[0]) for r in rows], np.int64)
        cal = np.array(
            [_md5_64(f"conf:42:{i}") % CONF_CAL_MOD == 0 for i in range(60)]
        )
        n_cal = int(cal.sum())
        assert int(out["n_cal"].iloc[0]) == n_cal
        assert int(out["n_test"].iloc[0]) == 60 - n_cal
        k = min(n_cal, -(-((n_cal + 1) * (10000 - CONF_ALPHA_BP)) // 10000))
        thr = int(np.sort(scores[cal])[k - 1])
        assert int(out["threshold"].iloc[0]) == thr
        n_cov = int((scores[~cal] <= thr).sum())
        assert int(out["n_covered"].iloc[0]) == n_cov
        assert int(out["coverage_bp"].iloc[0]) == 10000 * n_cov // (60 - n_cal)


class TestAbTestStats:
    def test_chi2_brute_force(self, ray_session, tmp_path):
        # users 0..9, purchases for a deterministic subset; repeated
        # purchase events must not double-count a user
        rows = []
        for u in range(10):
            rows.append((u, "view"))
            if u % 3 == 0:
                rows.append((u, "purchase"))
                rows.append((u, "purchase"))
        _write_events(tmp_path, rows)
        out = q_ab_test_stats(str(tmp_path))
        var = {u: _md5_64(f"ab:42:{u}") % 2 for u in range(10)}
        conv = {u: 1 if u % 3 == 0 else 0 for u in range(10)}
        ua = sum(1 for u in range(10) if var[u] == 0)
        ca = sum(conv[u] for u in range(10) if var[u] == 0)
        ub, cb = 10 - ua, sum(conv.values()) - ca
        assert int(out["users_a"].iloc[0]) == ua
        assert int(out["conv_a"].iloc[0]) == ca
        assert int(out["users_b"].iloc[0]) == ub
        assert int(out["conv_b"].iloc[0]) == cb
        a, b, c, d = ca, ua - ca, cb, ub - cb
        den = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = (1_000_000 * 10 * (a * d - b * c) ** 2) // den if den else 0
        assert int(out["chi2_ppm"].iloc[0]) == chi2


class TestJlDistortion:
    def test_projection_arithmetic(self, ray_session, tmp_path):
        vecs = [(0.25, -0.125, 0.5, 0.0), (0.1, 0.2, 0.3, 0.4)]
        _write_emb(tmp_path, vecs)
        out = q_jl_distortion(str(tmp_path)).to_pandas().sort_values("vec_id")
        q = np.floor(
            np.array(vecs, np.float32).astype(np.float64) * 1000.0
        ).astype(np.int64)
        s = _jl_signs(4)
        y = q @ s.T
        qn = (q * q).sum(axis=1)
        pn = (y * y).sum(axis=1)
        assert out["qnorm"].tolist() == qn.tolist()
        assert out["pnorm"].tolist() == pn.tolist()
        ratio = np.where(qn > 0, 1_000_000 * pn // np.maximum(JL_K * qn, 1), 0)
        assert out["ratio_ppm"].tolist() == ratio.tolist()

    def test_sign_matrix_is_pm1(self):
        s = _jl_signs(16)
        assert s.shape == (JL_K, 16)
        assert set(np.unique(s)) == {-1, 1}
