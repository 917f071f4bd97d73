"""webtext_ops semantics on planted fixtures: PII regex decoys and
engine parity, segment-dedup keep-first ordering, boilerplate density
discrimination, and epoch-shuffle permutation laws. Oracle parity at
gate scale is covered by the driver gate / tools/check_oracles.py."""

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from europarl_crawler_ray.functions.boilerplate import (
    extract_main_blocks,
    render_boilerplate_page,
)
from europarl_crawler_ray.pipelines.webtext_ops import (
    EPOCH_BATCH_ROWS,
    EPOCH_SEED,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    SEG_W,
    pii_footer,
    q_epoch_shuffle,
    q_paragraph_dedup,
    scrub_pii,
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


# ---------------------------------------------------------------- PII


def test_scrub_pii_decoys_untouched():
    s, ne, np_, ni = scrub_pii(
        "write user@@example.com or 999.999.999.999 or +1-12-555-123 v price.99.99"
    )
    assert (ne, np_, ni) == (0, 0, 0)
    assert "user@@example.com" in s and "999.999.999.999" in s


def test_scrub_pii_hits_and_order():
    s, ne, np_, ni = scrub_pii(
        "mail a.b+c@ex-1.org tel +1-234-555-6789 host 10.0.0.1 and 255.255.255.255"
    )
    assert (ne, np_, ni) == (1, 1, 2)
    assert s == "mail <EMAIL> tel <PHONE> host <IP> and <IP>"


def test_pii_footer_scrubs_to_exactly_one_of_each():
    for d in [0, 1, 6, 199, 200, 40001, 123456]:
        _, ne, np_, ni = scrub_pii(pii_footer(d))
        assert (ne, np_, ni) == (1, 1, 1), d


def test_pii_regex_engine_parity_fuzz():
    # adversarial corpus: partial overlaps, boundary abuse, mixed hits
    cases = [
        "1.2.3.4.5 and 256.1.2.3 then 25.26.27.28",
        "x+1-999-555-0000 +1-999-555-00001 +1-999-555-0000",
        "a@b.co a@b.c a@@b.co .@b.co a@.co",
        "0.0.0.0 00.1.2.3 10.20.30.40ver 1.1.1.1",
        "e%x_1.2@d-o.t.museum trailing dot a@b.com.",
        pii_footer(777) + " " + pii_footer(54321),
    ]
    con = duckdb.connect()
    for s in cases:
        py = scrub_pii(s)
        row = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(s, ?, '<EMAIL>', 'g'),"
            " ?, '<PHONE>', 'g'), ?, '<IP>', 'g'),"
            " len(regexp_extract_all(s, ?)), len(regexp_extract_all(s, ?)),"
            " len(regexp_extract_all(s, ?)) FROM (VALUES (?)) t(s)",
            [PII_EMAIL_RE, PII_PHONE_RE, PII_IP_RE,
             PII_EMAIL_RE, PII_PHONE_RE, PII_IP_RE, s],
        ).fetchone()
        assert py == (row[0], row[1], row[2], row[3]), s


# ------------------------------------------------------ paragraph dedup


def test_paragraph_dedup_keep_first_and_empty_doc(ray_session, tmp_path):
    w = "w " * (SEG_W - 1) + "w"  # exactly one segment of SEG_W words
    texts = {
        1: w,             # owns the segment (lowest doc_id)
        2: w,             # fully deduplicated away
        3: w + " tail",   # seg0 lost to doc 1, seg1 ("tail") survives
    }
    _write_docs(tmp_path, texts)
    out = (
        q_paragraph_dedup(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_segs"] == 1 and out.loc[1, "n_kept"] == 1
    assert out.loc[1, "dedup_md5"] == hashlib.md5(w.encode()).hexdigest()
    # doc 2 still appears, with nothing left
    assert out.loc[2, "n_kept"] == 0
    assert out.loc[2, "dedup_md5"] == hashlib.md5(b"").hexdigest()
    assert out.loc[3, "n_segs"] == 2 and out.loc[3, "n_kept"] == 1
    assert out.loc[3, "dedup_md5"] == hashlib.md5(b"tail").hexdigest()


def test_paragraph_dedup_header_key_never_collides_with_segment(ray_session, tmp_path):
    # a document whose TEXT equals another doc's header key must not
    # interfere with that header
    _write_docs(tmp_path, {7: "h:8", 8: "x y z"})
    out = q_paragraph_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[7, "n_kept"] == 1 and out.loc[8, "n_kept"] == 1


# ------------------------------------------------------ main content


def test_block_density_discrimination():
    page = (
        "<html><body>"
        # linky long block: must be dropped despite having many words
        '<p><a href="/a">one two three four five</a> <a href="/b">six seven eight</a> and</p>'
        # content block with a small inline link: must be KEPT
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa "
        'lambda mu <a href="/x">nu</a></p>'
        # too short: dropped
        "<p>hi there</p>"
        # whitespace-normalized content
        "<div>  spaced   out\n\ttext   here </div>"
        "</body></html>"
    )
    kept, total = extract_main_blocks(page)
    assert total == 4
    assert kept == [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
        "spaced out text here",
    ]


def test_render_page_roundtrip_census():
    text = " ".join(f"t{i}" for i in range(45))  # 45 words -> 2 chunks (20, 25)
    page = render_boilerplate_page(12, text, "src9", chunk_w=20)
    kept, total = extract_main_blocks(page)
    assert total == 2 + 3  # title + nav + 2 chunks + footer
    assert " ".join(kept) == text


def test_render_page_escaping_roundtrip():
    text = "a <b> & c \"d\" ' x y z"
    page = render_boilerplate_page(1, text, "s&1", chunk_w=20)
    kept, _ = extract_main_blocks(page)
    assert " ".join(kept) == text


# ------------------------------------------------------ epoch shuffle


def test_epoch_shuffle_is_exact_global_rank(ray_session, tmp_path):
    texts = {i: "x" for i in range(257)}  # spans several hash buckets
    _write_docs(tmp_path, texts)
    out = q_epoch_shuffle(str(tmp_path)).to_pandas()
    assert sorted(out["global_rank"]) == list(range(257))
    expect = sorted(
        (hashlib.md5(f"{EPOCH_SEED}|{i}".encode()).hexdigest(), i) for i in texts
    )
    by_rank = out.sort_values("global_rank")
    assert list(by_rank["doc_id"]) == [i for _k, i in expect]
    assert (by_rank["batch_id"].to_numpy()
            == by_rank["global_rank"].to_numpy() // EPOCH_BATCH_ROWS).all()


# ------------------------------------------------------------ refinery


def test_refinery_gate_and_global_rank(ray_session, tmp_path):
    from europarl_crawler_ray.pipelines.webtext_ops import q_refinery

    w = " ".join(f"unique{i}" for i in range(SEG_W))  # one full unique segment
    v = " ".join(f"fresh{i}" for i in range(SEG_W))
    texts = {
        1: w,            # survives (unique, 1 seg kept, > 40 bytes)
        2: w,            # fully deduped -> dropped (n_kept 0)
        3: "tiny doc",   # < 40 bytes -> dropped
        4: w + " " + v,  # seg0 lost to doc 1, seg1 survives: 1 of 2 kept
    }
    _write_docs(tmp_path, texts)
    res = q_refinery(str(tmp_path))
    out = (res.to_pandas() if hasattr(res, "to_pandas") else res).set_index("doc_id")
    assert sorted(out.index) == [1, 4]
    assert sorted(out["rank"]) == [0, 1]  # dense global rank over survivors
    assert (out["shard"] == out["rank"] % 16).all()
    # doc 4 sits exactly on the 50%-loss gate boundary (n_kept*2 == n_segs)
    assert out.loc[4, "n_segs"] == 2 and out.loc[4, "n_kept"] == 1
