"""From-scratch WARC (ISO 28500) reader/writer + Ray source."""

import gzip

import pytest

from europarl_crawler_ray.sources.warc import (
    parse_warc,
    read_warc,
    write_warc_gz,
    write_warc_record,
)

RECS = [
    ("https://ex.org/a", "hello WARC".encode(), "2021-01-01T00:00:00Z"),
    ("https://ex.org/b", "ünïcode ⚡ payload".encode(), "2021-06-15T12:30:00Z"),
    ("https://ex.org/c", b"", "2021-01-01T00:00:00Z"),  # empty payload
    ("https://ex.org/d", b"\r\n\r\nWARC/1.0\r\n", "2021-01-01T00:00:00Z"),  # adversarial
]


def test_roundtrip_gz():
    data = write_warc_gz(RECS)
    out = parse_warc(data)
    assert [(r["uri"], r["payload"], r["ts"]) for r in out] == RECS


def test_roundtrip_plain_and_member_concat():
    # concatenated gzip members (two shards appended) parse as one file
    data = write_warc_gz(RECS[:2]) + write_warc_gz(RECS[2:])
    out = parse_warc(data)
    assert len(out) == 4
    # plain (uncompressed) records parse too
    plain = b"".join(write_warc_record(u, p, t) for u, p, t in RECS)
    assert [(r["uri"], r["payload"]) for r in parse_warc(plain)] == [
        (u, p) for u, p, _ in RECS
    ]


def test_content_length_framing_not_delimiters():
    # payload containing CRLFCRLF and a fake version line must NOT split
    # the record — framing is Content-Length, not delimiters
    out = parse_warc(write_warc_gz([RECS[3]]))
    assert len(out) == 1 and out[0]["payload"] == RECS[3][1]


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    good = gzip.decompress(write_warc_gz(RECS[:1]))
    with pytest.raises(ValueError):
        parse_warc(good[:-6])  # truncated payload


def test_records_are_individual_gzip_members():
    data = write_warc_gz(RECS[:2])
    # a second member must start after the first: find two gzip magics
    assert data.count(b"\x1f\x8b\x08") >= 2


def test_ray_source_reads_shards(ray_session, tmp_path):
    (tmp_path / "s0.warc.gz").write_bytes(write_warc_gz(RECS[:2]))
    (tmp_path / "s1.warc.gz").write_bytes(write_warc_gz(RECS[2:]))
    df = read_warc(str(tmp_path)).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == sorted(u for u, _, _ in RECS)
    assert df["html"].map(bytes).tolist() == [
        p for _, p, _ in sorted(RECS, key=lambda r: r[0])
    ]
    assert str(df["warc_ts"].dtype).startswith("datetime64")


def test_non_response_records_skipped(ray_session, tmp_path):
    import io

    from europarl_crawler_ray.sources.warc import write_warc_record

    raw = write_warc_record("urn:x", b"warcinfo body", warc_type="warcinfo")
    raw += write_warc_record("https://ex.org/keep", b"kept", "2021-01-01T00:00:00Z")
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    (tmp_path / "mixed.warc.gz").write_bytes(buf.getvalue())
    df = read_warc(str(tmp_path)).to_pandas()
    assert list(df["url"]) == ["https://ex.org/keep"]
