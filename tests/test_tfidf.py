"""tfidf_topk: integer tf-idf ranking semantics on a tiny corpus (df
across docs, score ordering, deterministic tie-break). Oracle parity is
covered by the gate."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.queries import q_tfidf_topk


@pytest.fixture(scope="module")
def tiny(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("tfidf_sf")
    texts = {
        0: "apple apple banana common",   # apple: tf2 df1 -> top
        1: "banana banana common common",  # banana tf2 df2 beats common tf2 df3
        2: "cherry common",               # cherry tf1 df1 beats common tf1 df3
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return q_tfidf_topk(str(d)).to_pandas()


def test_rank1_terms(tiny):
    top = tiny[tiny["rank"] == 1].set_index("doc_id")["term"]
    assert top.to_dict() == {0: "apple", 1: "banana", 2: "cherry"}


def test_scores_exact(tiny):
    r = tiny.set_index(["doc_id", "term"])
    assert r.loc[(0, "apple"), "score"] == 2_000_000      # tf2/df1
    assert r.loc[(1, "banana"), "score"] == 1_000_000     # tf2/df2
    assert r.loc[(2, "common"), "score"] == 1_000_000 // 3  # tf1/df3
    assert r.loc[(0, "common"), "df"] == 3


def test_tie_break_is_term_asc(ray_session, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["zed yak zed yak"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([15], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = q_tfidf_topk(str(tmp_path)).to_pandas().sort_values("rank")
    # equal tf and df -> equal score; 'yak' < 'zed' wins rank 1
    assert df["term"].tolist() == ["yak", "zed"]
