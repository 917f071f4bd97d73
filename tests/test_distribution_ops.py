"""Tests for zipf_slope / vocab_growth (corpus_ops) and ece_calibration
(validation_ops): DuckDB-oracle parity plus brute-force checks of the
integer-moment slope, the decile saturation counts, and the calibration
bins on hand-built corpora."""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.corpus_ops import (
    VOCAB_GROWTH_SQL,
    ZIPF_SLOPE_SQL,
    ZIPF_TOP_K,
    q_vocab_growth,
    q_zipf_slope,
)
from europarl_crawler_ray.pipelines.validation_ops import (
    ECE_CALIBRATION_SQL,
    _ece_weights,
    q_ece_calibration,
)


class TestOracleParity:
    def test_parity(self, ray_session, sf_dir):
        from check_oracles import TABLES, compare, to_pandas

        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name, fn, sql in [
            ("zipf_slope", q_zipf_slope, ZIPF_SLOPE_SQL),
            ("vocab_growth", q_vocab_growth, VOCAB_GROWTH_SQL),
            ("ece_calibration", q_ece_calibration, ECE_CALIBRATION_SQL),
        ]:
            ray_df = to_pandas(fn(sf_dir))
            sql_df = con.execute(sql).fetchdf()
            assert compare(name, ray_df, sql_df) == [], name


def _write_docs(d, texts, langs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


class TestZipfSlope:
    def test_brute_force(self, ray_session, tmp_path):
        # freq table: "a"x8 "b"x4 "c"x2 "d"x1 in one lang
        texts = ["a a a a a a a a b b b b", "c c d"]
        _write_docs(tmp_path, texts, ["en", "en"])
        out = q_zipf_slope(str(tmp_path)).set_index("lang")
        cnts = [8, 4, 2, 1]
        lx = [math.floor(1e6 * math.log(r)) for r in range(1, 5)]
        ly = [math.floor(1e6 * math.log(c)) for c in cnts]
        k, sx, sy = 4, sum(lx), sum(ly)
        sxx = sum(x * x for x in lx)
        sxy = sum(x * y for x, y in zip(lx, ly))
        want = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert out.loc["en", "n_terms"] == 4
        assert out.loc["en", "zipf_slope"] == want
        # a perfect zipf of powers of 2 over ranks 1,2,4 is ~-1 slope-ish;
        # sanity: slope negative
        assert out.loc["en", "zipf_slope"] < 0

    def test_topk_prune_is_global(self, ray_session, tmp_path):
        # 3 langs x disjoint vocab; more tokens than ZIPF_TOP_K in one
        toks = " ".join(f"t{i}" for i in range(ZIPF_TOP_K + 40))
        _write_docs(tmp_path, [toks, "x x x y y z"], ["de", "fr"])
        out = q_zipf_slope(str(tmp_path)).set_index("lang")
        assert out.loc["de", "n_terms"] == ZIPF_TOP_K
        assert out.loc["fr", "n_terms"] == 3


class TestVocabGrowth:
    def test_brute_force(self, ray_session, tmp_path):
        # 10 docs; doc i introduces token f"n{i}" plus repeats token "c"
        texts = [f"c n{i}" for i in range(10)]
        _write_docs(tmp_path, texts, ["en"] * 10)
        out = q_vocab_growth(str(tmp_path))
        assert list(out["decile"]) == list(range(1, 11))
        assert list(out["cutoff"]) == list(range(1, 11))
        # vocab after decile d (first_id < d): d novel tokens + "c"
        assert list(out["vocab_size"]) == [d + 1 for d in range(1, 11)]

    def test_empty(self, ray_session, tmp_path):
        _write_docs(tmp_path, [], [])
        out = q_vocab_growth(str(tmp_path))
        assert len(out) == 10
        assert out["vocab_size"].sum() == 0


class TestEceCalibration:
    def test_brute_force(self, ray_session, tmp_path):
        dim = 64
        rng = np.random.default_rng(7)
        emb = rng.uniform(-1, 1, size=(40, dim))
        labels = rng.integers(0, 4, size=40)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array([list(map(float, e)) for e in emb],
                                          pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int64()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = q_ece_calibration(str(tmp_path)).set_index("bin")
        # brute force in plain numpy over the float32-realized column
        mat = np.stack(
            pq.read_table(str(tmp_path / "embeddings.parquet"))["embedding"]
            .to_pandas()
            .to_numpy()
        ).astype(np.float64)
        q = np.floor(mat * 1000.0).astype(np.int64)
        s = q @ _ece_weights()
        pos = (labels == 0).astype(np.int64)
        span = int(s.max() - s.min())
        pbp = (s - s.min()) * 10000 // span if span else np.zeros_like(s)
        bins = np.minimum(pbp // 1000, 9)
        for b in np.unique(bins):
            m = bins == b
            n = int(m.sum())
            assert out.loc[b, "n"] == n
            assert out.loc[b, "conf_bp"] == int(pbp[m].sum()) // n
            assert out.loc[b, "acc_bp"] == int(pos[m].sum()) * 10000 // n
        assert set(out.index) == set(int(b) for b in np.unique(bins))
