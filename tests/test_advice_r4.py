"""Regression pins for the round-4 ADVICE parity findings — each one a
latent Ray-vs-DuckDB divergence masked by the driver testdata (no CR
docs, no empty docs, default-n only). Each test plants the exact input
class the advice named and asserts engine parity on it."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from europarl_crawler_ray.pipelines.corpus_ops import (
    _NOVELTY_GRAM_EXPR,
    NGRAM_NOVELTY_SQL,
    NOVELTY_N,
)
from europarl_crawler_ray.pipelines.selection_ops import (
    EXACT_SUBSTR_SPANS_SQL,
    _kcenter_sql,
    q_exact_substr_spans,
)
from europarl_crawler_ray.pipelines.webtext_ops import (
    TOKENIZER_FERTILITY_SQL,
    q_tokenizer_fertility,
)


def _write_docs(path, texts: dict[int, str]):
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
        }
    )
    pq.write_table(t, path / "documents.parquet")


def _oracle(path, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_tokenizer_fertility_carriage_return_parity(ray_session, tmp_path):
    # ADVICE r4 #1: the SQL regex class lost its \r, so "a\rb" was ONE
    # oracle token but TWO Ray tokens. Plant CR-separated text and
    # demand full-frame parity.
    texts = {
        1: "alpha\rbeta gamma",        # bare CR separator
        2: "one\r\ntwo\rthree",        # CRLF + CR mix
        3: "plain text no cr",
        4: "\r\r\r",                   # CR-only doc: zero tokens
    }
    _write_docs(tmp_path, texts)
    ray_df = q_tokenizer_fertility(str(tmp_path)).to_pandas()
    assert int(ray_df["n_tokens"].iloc[0]) == 3 + 3 + 4 + 0
    sql_df = _oracle(tmp_path, TOKENIZER_FERTILITY_SQL)
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(sql_df))


def test_exact_substr_spans_empty_text_parity(ray_session, tmp_path):
    # ADVICE r4 #3: integer-division-by-zero gives NULL in DuckDB but
    # the Ray path returned 0 — plant an empty doc and demand both say 0.
    dup = "0123456789abcdefghij" * 4  # > SUBSTR_L, shared verbatim
    texts = {1: dup + " one", 2: dup + " two", 3: ""}
    _write_docs(tmp_path, texts)
    ray_df = q_exact_substr_spans(str(tmp_path)).to_pandas()
    sql_df = _oracle(tmp_path, EXACT_SUBSTR_SPANS_SQL)
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(sql_df))
    empty = ray_df.set_index("doc_id").loc[3]
    assert int(empty["coverage_bp"]) == 0 and int(empty["n_chars"]) == 0


def test_ngram_novelty_sql_gram_width_follows_constant():
    # ADVICE r4 #4: the gram concat was hardcoded 3-wide while the range
    # bound interpolated NOVELTY_N. The expression is now built FROM the
    # constant — pin that the widths agree.
    assert _NOVELTY_GRAM_EXPR.count("ws[") == NOVELTY_N
    assert _NOVELTY_GRAM_EXPR in NGRAM_NOVELTY_SQL
    assert f"{{NOVELTY_N}}" not in NGRAM_NOVELTY_SQL  # fully interpolated


def test_kcenter_sql_casts_embeddings_to_double():
    # ADVICE r4 #2: distances on raw FLOAT[] accumulate in float32 while
    # the Ray path is float64 — the e CTE must cast, like every other
    # vector oracle in the repo.
    sql = _kcenter_sql(3)
    assert "CAST(embedding AS DOUBLE[])" in sql


def test_quantized_cosine_thresholds_are_integers():
    # ADVICE r4 #5: cascade stage 3 (and semdedup) compared float64
    # normalized-dot against DuckDB's list_cosine_similarity — a
    # different fp formula. Both now share the floor(1000x) integer rule.
    from europarl_crawler_ray.pipelines import mining_ops as m

    assert m._SEMDEDUP_QTAU == int(round(m.SEMDEDUP_TAU * 1000))
    assert "floor(1000 * list_cosine_similarity" in m.SEMDEDUP_SQL
    assert str(m._SEMDEDUP_QTAU) in m.SEMDEDUP_SQL
    # same rule on the numpy side: quantized grid never straddles the
    # threshold differently than the integer comparison
    sims = np.array([0.4499999, 0.45, 0.450001, 0.9])
    q = np.floor(1000.0 * sims)
    assert list(q >= m._SEMDEDUP_QTAU) == [False, True, True, True]


def test_proximity_rank_carriage_return_parity(ray_session, tmp_path):
    # Same mangling class as ADVICE r4 #1, found in round 5 in
    # PROXIMITY_RANK_SQL: the literal \r byte in the regex class had
    # become a second \n, so "scan\rjoin" was ONE oracle token but TWO
    # Ray tokens, shifting every position and the min window. Plant
    # CR-separated occurrences of all three PROX_TERMS.
    from europarl_crawler_ray.pipelines.webtext_ops import (
        PROXIMITY_RANK_SQL,
        q_proximity_rank,
    )

    texts = {
        1: "scan\rjoin sort",                    # CR inside the window
        2: "scan x\r\njoin y sort",              # CRLF mix
        3: "sort\rfiller join\rscan join sort",  # repeats across CRs
        4: "scan join",                          # missing a term: no row
    }
    _write_docs(tmp_path, texts)
    ray_df = q_proximity_rank(str(tmp_path)).to_pandas()
    assert set(ray_df["doc_id"]) == {1, 2, 3}
    assert int(ray_df.set_index("doc_id")["min_span"].loc[1]) == 3
    sql_df = _oracle(tmp_path, PROXIMITY_RANK_SQL)
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(sql_df))
