"""WARC source/sink — the Common-Crawl container format (ISO 28500).

From-scratch (stdlib-only) WARC/1.0 support: ``write_warc_gz`` emits one
gzip member per record (the standard .warc.gz framing, so shards remain
member-concatenable), ``parse_warc`` walks version-line → headers →
Content-Length payload framing, and ``read_warc`` exposes shards as a
``ray.data.Dataset`` in the pages-table shape. The WARC FILE is the
parallelism unit — exactly how Common Crawl segments its dumps — so a
100 TB crawl reads thousands of shards with one fused read+parse task
each and never concatenates anything driver-side.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone

import pyarrow as pa
import ray.data

CRLF = b"\r\n"


def _record_id(uri: str, ts: str) -> str:
    return "<urn:uuid:" + hashlib.md5(f"{uri}\x00{ts}".encode()).hexdigest() + ">"


def write_warc_record(
    uri: str,
    payload: bytes,
    ts: str = "2021-01-01T00:00:00Z",
    warc_type: str = "response",
    content_type: str = "text/html",
) -> bytes:
    """One WARC/1.0 record (uncompressed bytes)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + _record_id(uri, ts).encode(),
        b"WARC-Date: " + ts.encode(),
        b"WARC-Target-URI: " + uri.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return CRLF.join(headers) + CRLF + CRLF + payload + CRLF + CRLF


def write_warc_gz(records: list[tuple[str, bytes, str]]) -> bytes:
    """(uri, payload, ts) records → .warc.gz bytes, ONE GZIP MEMBER PER
    RECORD (the framing real WARC tooling requires for record-level
    seeks; members concatenate into one valid file)."""
    out = io.BytesIO()
    for uri, payload, ts in records:
        # mtime=0 → deterministic bytes for a given record
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(write_warc_record(uri, payload, ts))
    return out.getvalue()


def write_warc_gz_indexed(
    records: list[tuple[str, bytes, str]],
) -> tuple[bytes, list[dict]]:
    """Like ``write_warc_gz`` but also returns the CDX-style index the
    write is the only cheap place to build: one entry per record with
    the member's byte ``offset``/``length`` inside the shard and the
    payload digest. Because each record is its own gzip member, a
    reader can later fetch any record with one ranged read — the
    random-access pattern CDX servers (and every Common-Crawl consumer)
    rely on."""
    out = io.BytesIO()
    index: list[dict] = []
    for uri, payload, ts in records:
        start = out.tell()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(write_warc_record(uri, payload, ts))
        index.append(
            {
                "uri": uri,
                "ts": ts,
                "offset": start,
                "length": out.tell() - start,
                "digest": hashlib.md5(payload).hexdigest(),
            }
        )
    return out.getvalue(), index


def read_warc_record_at(path: str, offset: int, length: int) -> dict:
    """Random-access record fetch: one ranged read of the gzip member at
    (offset, length), decompressed and parsed in isolation."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    recs = parse_warc(blob)
    if len(recs) != 1:
        raise ValueError(f"expected 1 record at {path}:{offset}+{length}, got {len(recs)}")
    return recs[0]


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzipped — including concatenated members — or
    plain) into records: {uri, ts, type, payload}."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
        length = int(headers.get("content-length", "0"))
        payload = data[pos : pos + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        pos += length
        out.append(
            {
                "uri": headers.get("warc-target-uri", ""),
                "ts": headers.get("warc-date", ""),
                "type": headers.get("warc-type", ""),
                "payload": payload,
            }
        )
    return out


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """WARC shards → Dataset(url, warc_ts, html) — the BASELINE.json
    pages-table input shape. One fused read+parse task per shard file
    (``read_binary_files`` emits one block per file); nothing touches
    the driver."""

    def to_rows(batch: pa.Table) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc(blob):
                if rec["type"] != "response":
                    continue  # warcinfo / request / metadata records
                urls.append(rec["uri"])
                tss.append(
                    datetime.strptime(rec["ts"], "%Y-%m-%dT%H:%M:%S%z").astimezone(
                        timezone.utc
                    )
                )
                payloads.append(rec["payload"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    return ray.data.read_binary_files(paths).map_batches(
        to_rows, batch_format="pyarrow"
    )
