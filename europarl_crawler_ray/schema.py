"""Arrow schemas — the engine's data model.

The reference keeps five mutable Postgres tables (see
``/root/reference/europarl/db/*.py``); the rebuild replaces them with
immutable Arrow-schema'd Datasets + append-only Parquet partitions:

- ``pages``      — the input/output table fixed by BASELINE.json's
                   ``input_hint``: Common-Crawl-style fetched pages.
- ``frontier``   — candidate URLs per wave (reference: ``urls`` table,
                   ``europarl/db/url.py:30-53``).
- ``fetch_log``  — append-only request log (reference: ``requests`` table,
                   ``europarl/db/requests.py:23-42``).
- ``seed_dates`` — candidate session days (reference: ``session_days``,
                   ``europarl/db/sessionDay.py:24-31``).
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
# text:string, lang:string)
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Narrow frontier rows: html/text never travel through the scheduler
# (SURVEY.md §7.3 item 5 — keep wide binary out of sort/shuffle stages).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("url_hash", pa.uint64()),   # first 64 bits of the 128-bit hash
        pa.field("url_hash2", pa.uint64()),  # second 64 bits (bloom double-hash)
        pa.field("rulename", pa.string()),
        pa.field("date", pa.date32()),
        pa.field("priority", pa.int64()),    # bigger = sooner (newest-first)
        pa.field("wave", pa.int32()),
    ]
)

# Reference requests table: (url_id, document_id, requested_at, status_code,
# redirected_url) — url string replaces the id indirection.
FETCH_LOG_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("rulename", pa.string()),
        pa.field("date", pa.date32()),
        pa.field("requested_at", pa.timestamp("us", tz="UTC")),
        pa.field("status_code", pa.int32()),
        pa.field("redirected_url", pa.string()),
        pa.field("attempt", pa.int32()),
        pa.field("wave", pa.int32()),
    ]
)

SEED_DATES_SCHEMA = pa.schema(
    [
        pa.field("date", pa.date32()),
        pa.field("is_session", pa.bool_()),
    ]
)

# Output record shape for the final sink — the flattened union the reference
# pushes to Elasticsearch (mapping europarl/europarl_index.json:1-34).
INDEX_DOC_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("downloaded_at", pa.timestamp("us", tz="UTC")),
        pa.field("filesize", pa.int64()),
        pa.field("filetype", pa.string()),
        pa.field("content", pa.string()),
        pa.field("language", pa.string()),
        pa.field("rulename", pa.string()),
        pa.field("session_date", pa.date32()),
    ]
)
