"""Composite quality gate (quality_filter): each rule fires on a doc
constructed to trip exactly that rule, and the keep decision is the
conjunction. Oracle parity is covered by the gate (check_oracles)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.pipelines.queries import q_quality_filter


@pytest.fixture(scope="module")
def qf(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("qf_sf")
    good = ("the cat and the dog are in a house that is on a hill " * 4).strip()
    docs = {
        0: ("en", good),                                # passes every rule
        1: ("en", "the and of it"),                     # too short
        2: ("en", good + " word" * ((501 - len(good)) // 5 + 1)),  # too long
        3: ("en", ("1234 5678 90!! " * 10).strip()),    # low alpha (also no stopwords)
        4: ("en", ("quick brown foxes jump over lazy dogs near rivers today " * 2).strip()),  # no stopwords
        5: ("de", ("quick brown foxes jump over lazy dogs near rivers today " * 2).strip()),  # same text, non-en: exempt
        6: ("en", ("the cat " + "of dog " * 40).strip()),  # dominant bigram
        7: ("en", ""),                                  # empty text
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "lang": pa.array([v[0] for v in docs.values()]),
            "text": pa.array([v[1] for v in docs.values()]),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array([len(v[1]) for v in docs.values()], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    df = q_quality_filter(str(d)).to_pandas().set_index("doc_id").sort_index()
    return df


def test_good_doc_kept(qf):
    row = qf.loc[0]
    assert row["keep"] == 1
    assert (
        row[["f_short", "f_long", "f_alpha", "f_stopword", "f_bigram"]] == 0
    ).all()


@pytest.mark.parametrize(
    "doc_id,flag",
    [(1, "f_short"), (2, "f_long"), (3, "f_alpha"), (4, "f_stopword"), (6, "f_bigram")],
)
def test_rule_fires(qf, doc_id, flag):
    assert qf.loc[doc_id, flag] == 1
    assert qf.loc[doc_id, "keep"] == 0


def test_stopword_rule_is_english_only(qf):
    # doc 5 is byte-identical text to doc 4 but lang='de' — exempt
    assert qf.loc[4, "f_stopword"] == 1
    assert qf.loc[5, "f_stopword"] == 0


def test_empty_text_short_not_bigram(qf):
    row = qf.loc[7]
    assert row["f_short"] == 1 and row["f_bigram"] == 0 and row["n_bigrams"] == 0
