"""Web-corpus operators (round-3 batch 6): parallel-corpus (bitext)
alignment, SURT locality keys, and a broadcast IP-range geo join.

The reference repo's whole purpose is harvesting EuroParl — the classic
parallel-corpus source — so ``bitext_align`` implements the alignment
shape its downstream consumers run (per-session language pivoting with
a Gale-Church-style length-ratio filter; cf. reference test fixtures
exercising per-language day/session documents). ``surt_keys`` is the
Common-Crawl/CDX Sorted-URL-Reordering-Transform: the canonical range-
partitioning key that co-locates a domain's pages in one shard.
``ip_geo_join`` is the broadcast-side range-lookup join (GeoIP shape):
the small sorted breakpoint table ships once via ``ray.put`` and every
batch binary-searches it — no shuffle, no per-batch re-ship.

All three SQL-oracled; scale idioms per pipelines/grouping.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .grouping import partitioned_anti_join
from .grouping import with_coarse_group as _with_coarse_group
from .ml_queries import _md5u  # the shared md5-uint64 SQL hash family


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ====================================================== bitext alignment
#
# Pair documents across languages inside a shared "session" (EuroParl's
# sitting): per (session, lang) pick the representative (min doc_id),
# pivot on English, and keep pairs passing the Gale-Church-lite length
# ratio (max/min <= 2). Output is the bitext candidate table a
# translation-pair miner feeds to an aligner.

BITEXT_SESSION_SIZE = 8  # consecutive doc_ids per synthetic session
BITEXT_PIVOT = "en"


def q_bitext_align(sf_dir: str):
    """(session_id, lang, doc_en, doc_xx, ratio_bp): per session, the
    pivot-language representative paired with every other language's
    representative, filtered to length ratio <= 2; ratio_bp is the
    integer basis-point ratio 10000*min/max (IEEE-free, oracle-exact).

    Scale shape: a 24-byte (doc_id, lang, n_chars) projection — bodies
    never move — through ONE coarse exchange on session_id; the
    representative pick and the pivot join are vectorized pandas inside
    each coarse task. Sessions are contiguous doc_id ranges, so the
    exchange is near-sorted and skew-free by construction."""
    d = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "session_id", pa.array(ids // BITEXT_SESSION_SIZE, type=pa.int64())
        )

    kd = _with_coarse_group(
        d.map_batches(keyed, batch_format="pyarrow"), "session_id"
    )

    def align(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        rep = g.drop_duplicates(["session_id", "lang"], keep="first")
        en = rep[rep["lang"] == BITEXT_PIVOT]
        xx = rep[rep["lang"] != BITEXT_PIVOT]
        m = xx.merge(
            en[["session_id", "doc_id", "n_chars"]],
            on="session_id",
            suffixes=("", "_en"),
        )
        if m.empty:
            return pd.DataFrame(
                {
                    "session_id": pd.Series([], dtype=np.int64),
                    "lang": pd.Series([], dtype=object),
                    "doc_en": pd.Series([], dtype=np.int64),
                    "doc_xx": pd.Series([], dtype=np.int64),
                    "ratio_bp": pd.Series([], dtype=np.int64),
                }
            )
        a = m["n_chars"].to_numpy(np.int64)
        b = m["n_chars_en"].to_numpy(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ok = (lo > 0) & (2 * lo >= hi)
        m = m[ok]
        return pd.DataFrame(
            {
                "session_id": m["session_id"].to_numpy(np.int64),
                "lang": m["lang"].to_numpy(),
                "doc_en": m["doc_id_en"].to_numpy(np.int64),
                "doc_xx": m["doc_id"].to_numpy(np.int64),
                "ratio_bp": 10000 * lo[ok] // hi[ok],
            }
        )

    return kd.groupby("_g").map_groups(align, batch_format="pandas")


BITEXT_ALIGN_SQL = f"""
WITH rep AS (
  SELECT session_id, lang, doc_id, n_chars FROM (
    SELECT doc_id // {BITEXT_SESSION_SIZE} AS session_id, lang, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY doc_id // {BITEXT_SESSION_SIZE}, lang
                              ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
), en AS (
  SELECT session_id, doc_id, n_chars FROM rep WHERE lang = '{BITEXT_PIVOT}'
), xx AS (
  SELECT session_id, lang, doc_id, n_chars FROM rep WHERE lang <> '{BITEXT_PIVOT}'
)
SELECT xx.session_id AS session_id, xx.lang AS lang,
       en.doc_id AS doc_en, xx.doc_id AS doc_xx,
       CAST(10000 * LEAST(en.n_chars, xx.n_chars)
            // GREATEST(en.n_chars, xx.n_chars) AS BIGINT) AS ratio_bp
FROM en JOIN xx USING (session_id)
WHERE LEAST(en.n_chars, xx.n_chars) > 0
  AND 2 * LEAST(en.n_chars, xx.n_chars) >= GREATEST(en.n_chars, xx.n_chars)
"""


# ========================================================== SURT keys
#
# Sorted URL Reordering Transform (the CDX / Common-Crawl index key):
# scheme dropped, host labels reversed and comma-joined, query params
# sorted — so one domain's pages are CONTIGUOUS under a global sort.
# The Ray side PARSES arbitrary urls (the oracle constructs expected
# keys from the generation rule, so any parser slip breaks the gate).

_SURT_SUBS = ["www", "en", "m", ""]
_SURT_TLDS = ["com", "org", "co.uk"]
N_SURT_SHARDS = 16


def _surt_url(doc_id: int) -> str:
    sub = _SURT_SUBS[doc_id % 4]
    host = (sub + "." if sub else "") + f"site{doc_id % 97}." + _SURT_TLDS[doc_id % 3]
    q = f"?b=2&a={doc_id % 5}" if doc_id % 2 == 0 else ""
    return f"https://{host}/p/{doc_id}{q}"


def surt_key(url: str) -> str:
    """SURT of ``url``: ``tld,dom,sub)/path?a=1&b=2`` (query sorted)."""
    rest = url.split("://", 1)[1]
    if "?" in rest:
        rest, query = rest.split("?", 1)
        query = "&".join(sorted(query.split("&")))
    else:
        query = ""
    host, _, path = rest.partition("/")
    rev = ",".join(reversed(host.lower().split(".")))
    return rev + ")/" + path + ("?" + query if query else "")


def q_surt_keys(sf_dir: str):
    """(doc_id, url, surt, shard): SURT key per url plus the locality
    shard — md5 of the reversed-host 2-label prefix % 16, so every page
    of a registrable domain lands in ONE shard (the partitioning a CDX
    writer sorts within; for multi-label suffixes like co.uk the PSL
    operator q_registrable_domain is the production prefix picker).

    Scale shape: a pure per-batch map — no exchange; the global sort by
    surt that a CDX writer runs afterwards is the epoch_shuffle terasort
    shape already demonstrated."""
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def make(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        urls = [_surt_url(int(i)) for i in ids]
        surts = [surt_key(u) for u in urls]
        prefix2 = [",".join(s.split(")", 1)[0].split(",")[:2]) for s in surts]
        shard = np.array(
            [
                int(hashlib.md5(p.encode("utf-8")).hexdigest()[:16], 16)
                % N_SURT_SHARDS
                for p in prefix2
            ],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {"doc_id": ids, "url": urls, "surt": surts, "shard": shard}
        )

    return d.map_batches(make, batch_format="pandas")


SURT_KEYS_SQL = f"""
WITH parts AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'www' WHEN 1 THEN 'en' WHEN 2 THEN 'm' ELSE '' END AS sub,
    'site' || CAST(doc_id % 97 AS VARCHAR) AS dom,
    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'co.uk' END AS tld,
    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'uk,co' END AS tldrev,
    '/p/' || CAST(doc_id AS VARCHAR) AS path,
    CASE WHEN doc_id % 2 = 0
         THEN 'a=' || CAST(doc_id % 5 AS VARCHAR) || '&b=2' ELSE '' END AS qsorted,
    CASE WHEN doc_id % 2 = 0
         THEN '?b=2&a=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END AS qraw
  FROM documents
), built AS (
  SELECT doc_id,
    'https://' || CASE WHEN sub = '' THEN '' ELSE sub || '.' END
      || dom || '.' || tld || path || qraw AS url,
    tldrev || ',' || dom || CASE WHEN sub = '' THEN '' ELSE ',' || sub END
      || ')' || path
      || CASE WHEN qsorted = '' THEN '' ELSE '?' || qsorted END AS surt,
    CASE doc_id % 3 WHEN 2 THEN 'uk,co' ELSE tldrev || ',' || dom END AS prefix2
  FROM parts
)
SELECT doc_id, url, surt,
       CAST({_md5u('prefix2')} % {N_SURT_SHARDS} AS BIGINT) AS shard
FROM built
"""


# ======================================================== IP-range geo join
#
# The GeoIP enrichment shape: a SMALL sorted range table (CIDR block ->
# country) against a LARGE fact stream. The block table is built once on
# the driver (bounded: N_GEO_BLOCKS rows), broadcast via ray.put, and
# each batch matches with one np.searchsorted — a broadcast range-lookup
# instead of an all-to-all range join.

N_GEO_BLOCKS = 64
_U32 = 1 << 32


def _geo_breakpoints() -> np.ndarray:
    bps = [
        int(hashlib.md5(f"blk|{i}".encode("utf-8")).hexdigest()[:16], 16) % _U32
        for i in range(N_GEO_BLOCKS)
    ]
    return np.array(sorted(bps), dtype=np.int64)


def _ip32(user_ids: np.ndarray) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(f"ip|{int(u)}".encode("utf-8")).hexdigest()[:16], 16)
            % _U32
            for u in user_ids
        ],
        dtype=np.int64,
    )


def q_ip_geo_join(sf_dir: str):
    """(country, n_events, n_users): per-country event volume after
    mapping every user's deterministic IPv4 through the breakpoint
    table; range k (k = number of breakpoints <= ip) is country Ckk.

    Scale shape: breakpoints broadcast ONCE via ray.put (read inside
    every task, never re-shipped per batch); per-batch (user, country,
    n) combiner -> ONE coarse exchange on user_id -> in-task per-user
    collapse -> bounded (<= 65-row) country groupby. A shuffle range
    join would move every event row; this moves one count per
    (batch, user)."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    bps_ref = ray.put(_geo_breakpoints())
    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).size()
        out.columns = ["user_id", "n"]
        bps = ray.get(bps_ref)
        k = np.searchsorted(bps, _ip32(out["user_id"].to_numpy(np.int64)), side="right")
        out["country"] = [f"C{int(i):02d}" for i in k]
        return out.astype({"user_id": np.int64, "n": np.int64})

    kd = _with_coarse_group(
        ev.map_batches(combine, batch_format="pandas"), "user_id"
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["user_id", "country"], as_index=False)["n"].sum()
        return out.astype({"user_id": np.int64, "n": np.int64})

    users = kd.groupby("_g").map_groups(per_user, batch_format="pandas")
    return (
        users.groupby("country")
        .aggregate(
            _Sum("n", alias_name="n_events"), _Count("user_id", alias_name="n_users")
        )
    )


IP_GEO_JOIN_SQL = f"""
WITH bp AS (
  SELECT i, CAST({_md5u("'blk|' || CAST(i AS VARCHAR)")} % 4294967296 AS BIGINT) AS b
  FROM range({N_GEO_BLOCKS}) t(i)
), ranges AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY b) AS BIGINT) AS k, b AS lo,
         LEAD(b, 1, 4294967296) OVER (ORDER BY b) AS hi
  FROM bp
), allr AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS lo,
         (SELECT MIN(b) FROM bp) AS hi
  UNION ALL SELECT k, lo, hi FROM ranges
), ips AS (
  SELECT user_id,
         CAST({_md5u("'ip|' || CAST(user_id AS VARCHAR)")} % 4294967296 AS BIGINT) AS ip,
         COUNT(*) AS n
  FROM events GROUP BY user_id
)
SELECT 'C' || lpad(CAST(r.k AS VARCHAR), 2, '0') AS country,
       CAST(SUM(i.n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ips i JOIN allr r ON i.ip >= r.lo AND i.ip < r.hi
GROUP BY 1
"""


# ====================================================== table extraction
#
# Structured-data harvesting from rendered HTML tables (the WebTables /
# WDC-corpus shape): each page renders one <table> with a header row,
# charref-encoded cell text, and script/comment decoys containing fake
# <td> markup; functions/extract.TableExtractor parses the cells back
# out. The oracle constructs the expected cells from the generation
# rule, so any parser slip (decoy leak, charref miss, index drift)
# breaks the gate.


def _table_html(doc_id: int) -> str:
    n_rows = 2 + doc_id % 4  # header row + 1..4 body rows
    n_cols = 2 + doc_id % 3
    parts = [
        "<html><body>\n<!-- <tr><td>comment decoy</td></tr> -->\n<table>\n  <tr>"
    ]
    # header: h{c} with the digit written as a charref (&#48; == '0')
    parts += [f"<th>h&#{48 + c};</th>" for c in range(n_cols)]
    parts.append("</tr>\n")
    for r in range(1, n_rows):
        parts.append("  <tr>")
        # body: v{doc}_{r}_{c} with '_' written as &#95;
        parts += [f"<td>v{doc_id}&#95;{r}_{c}</td>" for c in range(n_cols)]
        parts.append("</tr>\n")
    parts.append(
        '</table>\n<script>var x = "<td>script decoy</td>";</script>\n</body></html>'
    )
    return "".join(parts)


def q_table_extract(sf_dir: str):
    """(doc_id, row_idx, col_idx, cell, is_header): long-format cell
    table from every page's rendered <table>.

    Scale shape: a pure per-batch map (render -> parse -> fan out) — no
    exchange; output rows ~10x input rows, which the streaming executor
    absorbs block-by-block (no driver materialization)."""
    from ..functions.extract import extract_table_cells

    d = _read(sf_dir, "documents", columns=["doc_id"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        ids, rs, cs, cells, hdrs = [], [], [], [], []
        for i in df["doc_id"].to_numpy(np.int64):
            for r, c, text, is_h in extract_table_cells(_table_html(int(i))):
                ids.append(i)
                rs.append(r)
                cs.append(c)
                cells.append(text)
                hdrs.append(1 if is_h else 0)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype=np.int64),
                "row_idx": pd.Series(rs, dtype=np.int64),
                "col_idx": pd.Series(cs, dtype=np.int64),
                "cell": pd.Series(cells, dtype=object),
                "is_header": pd.Series(hdrs, dtype=np.int64),
            }
        )

    return d.map_batches(extract, batch_format="pandas")


TABLE_EXTRACT_SQL = """
SELECT doc_id, r AS row_idx, c AS col_idx,
  CASE WHEN r = 0 THEN 'h' || CAST(c AS VARCHAR)
       ELSE 'v' || CAST(doc_id AS VARCHAR) || '_' || CAST(r AS VARCHAR)
                || '_' || CAST(c AS VARCHAR) END AS cell,
  CASE WHEN r = 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_header
FROM documents,
     unnest(range(2 + doc_id % 4)) t(r),
     unnest(range(2 + doc_id % 3)) u(c)
"""


# ==================================================== charset detection
#
# The web serves bytes, not text: a crawler's normalize stage must sniff
# the encoding (BOM, then UTF-8 validation, then a legacy fallback) and
# decode to one canonical UTF-8 text column. The corpus stores each
# page's bytes in one of three encodings; the detector must name the
# charset AND round-trip the text md5-exactly.

_CHARSETS = ["utf-16-le", "utf-8-sig", "utf-8"]


def encode_page(text: str, enc_class: int) -> bytes:
    if enc_class == 0:
        return b"\xff\xfe" + text.encode("utf-16-le")
    if enc_class == 1:
        return b"\xef\xbb\xbf" + text.encode("utf-8")
    return text.encode("utf-8")


def detect_decode(raw: bytes) -> tuple[str, str]:
    """(charset, text): BOM sniff -> UTF-8 validation -> latin-1
    fallback (the WHATWG encoding-sniff order, legacy tail simplified;
    the fallback never mis-fires on the corpus rule but is pinned by
    unit tests). Inherent ambiguity (as in every BOM sniffer): a plain
    UTF-8 text whose first character IS U+FEFF is byte-identical to a
    BOM'd file and reads back without it."""
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le", raw[2:].decode("utf-16-le")
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", raw[3:].decode("utf-8")
    try:
        return "utf-8", raw.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1", raw.decode("latin-1")


def q_charset_normalize(sf_dir: str):
    """(doc_id, charset, n_bytes, text_md5): detected charset, raw byte
    length, and md5 of the decoded text — a wrong detection or a lossy
    decode changes text_md5.

    Scale shape: two chained per-batch maps (encode = the storage side,
    sniff+decode = the operator) — no exchange, binary column never
    leaves the task."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        raw = [
            encode_page(t, int(i) % 3) for i, t in zip(ids, df["text"].tolist())
        ]
        return pd.DataFrame({"doc_id": ids, "raw": pd.Series(raw, dtype=object)})

    def sniff(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        out_cs, out_nb, out_md5 = [], [], []
        for raw in df["raw"].tolist():
            raw = bytes(raw)
            cs, text = detect_decode(raw)
            out_cs.append(cs)
            out_nb.append(len(raw))
            out_md5.append(hashlib.md5(text.encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": ids,
                "charset": pd.Series(out_cs, dtype=object),
                "n_bytes": pd.Series(out_nb, dtype=np.int64),
                "text_md5": pd.Series(out_md5, dtype=object),
            }
        )

    return d.map_batches(encode, batch_format="pandas").map_batches(
        sniff, batch_format="pandas"
    )


CHARSET_NORMALIZE_SQL = """
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'utf-16-le' WHEN 1 THEN 'utf-8-sig'
       ELSE 'utf-8' END AS charset,
  CAST(CASE doc_id % 3 WHEN 0 THEN 2 + 2 * strlen(text)
       WHEN 1 THEN 3 + strlen(text) ELSE strlen(text) END AS BIGINT) AS n_bytes,
  md5(text) AS text_md5
FROM documents
"""


# ======================================================== MIME sniffing
#
# WHATWG-style content-type sniffing over raw payload bytes: exact magic
# numbers for binary formats, leading-whitespace-skipped case-insensitive
# tag match for HTML, and a binary-byte scan deciding text/plain vs
# octet-stream. The corpus plants one payload family per doc_id % 6.

_MIME_MAGICS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"%PDF-", "application/pdf"),
    (b"\x1f\x8b", "application/gzip"),
    (b"BM", "image/bmp"),
]
_BINARY_BYTES = frozenset(range(0x00, 0x09)) | {0x0B} | frozenset(range(0x0E, 0x1B)) | {
    0x1C,
    0x1D,
    0x1E,
    0x1F,
}


def sniff_mime(raw: bytes) -> str:
    """WHATWG mime-sniff (trimmed): magic table, then whitespace-skipped
    HTML tag match, then the binary-data-byte rule."""
    for magic, mime in _MIME_MAGICS:
        if raw[: len(magic)] == magic:
            return mime
    stripped = raw.lstrip(b"\t\n\x0c\r ")
    up = stripped[:15].upper()
    if up.startswith(b"<!DOCTYPE HTML") or up.startswith(b"<HTML"):
        return "text/html"
    if any(b in _BINARY_BYTES for b in raw[:512]):
        return "application/octet-stream"
    return "text/plain"


def _mime_payload(doc_id: int, text: str) -> bytes:
    filler = hashlib.md5(f"mime|{doc_id}".encode("utf-8")).digest()
    fam = doc_id % 6
    if fam == 0:
        return b"\x89PNG\r\n\x1a\n" + filler
    if fam == 1:
        return b"BM" + filler
    if fam == 2:
        return b"\x1f\x8b\x08" + filler
    if fam == 3:
        return b"%PDF-1.5\n" + filler
    if fam == 4:
        return b"\n\t  <!doctype html><html><body>x</body></html>"
    return text.encode("utf-8")


def q_mime_sniff(sf_dir: str):
    """(doc_id, mime): sniffed content type of each page's payload.

    Scale shape: pure per-batch map, binary payloads built and consumed
    inside the task (the fetch-side dispatch gate that routes a payload
    to the right extract stage)."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sniff(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        mimes = [
            sniff_mime(_mime_payload(int(i), t))
            for i, t in zip(ids, df["text"].tolist())
        ]
        return pd.DataFrame(
            {"doc_id": ids, "mime": pd.Series(mimes, dtype=object)}
        )

    return d.map_batches(sniff, batch_format="pandas")


MIME_SNIFF_SQL = """
SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
    WHEN 2 THEN 'application/gzip' WHEN 3 THEN 'application/pdf'
    WHEN 4 THEN 'text/html' ELSE 'text/plain' END AS mime
FROM documents
"""


# ====================================================== record linkage
#
# Entity resolution with blocking: each customer yields two records (the
# clean name and a deterministic mid-serial typo), records are blocked
# on the typo-stable name suffix, and every in-block pair within
# Levenshtein distance 2 is a linkage candidate. same_entity carries the
# ground truth so the output doubles as a precision measurement — the
# classic blocking-recall/threshold-precision trade every dedup-by-name
# pipeline tunes.

LINKAGE_MAX_DIST = 2


def _typo_name(name: str, custkey: int) -> str:
    pos = 9 + custkey % 6  # inside the 9-digit serial, last 3 chars intact
    return name[:pos] + "x" + name[pos + 1 :]


def levenshtein(a: str, b: str) -> int:
    """Two-row DP edit distance (Wagner-Fischer — public algorithm)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def q_record_linkage(sf_dir: str):
    """(rec_a, rec_b, dist, same_entity): all in-block record pairs with
    edit distance <= 2; same_entity = 1 when both records belong to one
    customer (the blocking key also admits near-serial FALSE candidates
    that the threshold must judge).

    Scale shape: variant fan-out in the read map; ONE coarse exchange on
    the block key; pairwise DP only INSIDE blocks (blocks are suffix-3
    groups, ~N/1000 records each — quadratic work stays bounded and
    local, the whole point of blocking)."""
    c = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["c_custkey"].to_numpy(np.int64)
        names = df["c_name"].tolist()
        typo = [_typo_name(n, int(k)) for n, k in zip(names, ck)]
        out = pd.DataFrame(
            {
                "custkey": np.concatenate([ck, ck]),
                "rec_id": np.concatenate([2 * ck, 2 * ck + 1]),
                "name": names + typo,
            }
        )
        out["block"] = [n[15:18] for n in out["name"]]
        return out

    kd = _with_coarse_group(
        c.map_batches(variants, batch_format="pandas"), "block"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ra, rb, dist, same = [], [], [], []
        for _, blk in g.groupby("block"):
            recs = sorted(
                zip(blk["rec_id"].to_numpy(np.int64), blk["name"], blk["custkey"])
            )
            names = [r[1] for r in recs]
            # exact-preserving prefilters (review of the 3.2 s profile):
            # all names here share one length, so (a) Hamming <= MAX
            # implies lev == Hamming (a single length-preserving edit is
            # a substitution), and (b) lev >= multiset-diff/2 rejects
            # without DP; only shift-like pairs (big Hamming, small
            # multiset diff) still pay the O(n^2) DP.
            same_len = len({len(nm) for nm in names}) == 1
            if same_len and names:
                try:
                    mat = np.frombuffer(
                        "".join(names).encode("latin-1"), dtype=np.uint8
                    ).reshape(len(names), -1)
                    cnt = np.stack(
                        [np.bincount(row, minlength=256) for row in mat]
                    )
                except UnicodeEncodeError:
                    # non-latin-1 names: fall back to the plain DP path
                    # the prefilter replaced (review finding)
                    same_len = False
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if same_len:
                        ham = int((mat[i] != mat[j]).sum())
                        if ham <= LINKAGE_MAX_DIST:
                            d = ham
                        elif (
                            int(np.abs(cnt[i] - cnt[j]).sum())
                            > 2 * LINKAGE_MAX_DIST
                        ):
                            continue
                        else:
                            d = levenshtein(recs[i][1], recs[j][1])
                    else:
                        d = levenshtein(recs[i][1], recs[j][1])
                    if d <= LINKAGE_MAX_DIST:
                        ra.append(recs[i][0])
                        rb.append(recs[j][0])
                        dist.append(d)
                        same.append(1 if recs[i][2] == recs[j][2] else 0)
        return pd.DataFrame(
            {
                "rec_a": pd.Series(ra, dtype=np.int64),
                "rec_b": pd.Series(rb, dtype=np.int64),
                "dist": pd.Series(dist, dtype=np.int64),
                "same_entity": pd.Series(same, dtype=np.int64),
            }
        )

    return kd.groupby("_g").map_groups(pairs, batch_format="pandas")


RECORD_LINKAGE_SQL = f"""
WITH recs AS (
  SELECT c_custkey AS custkey, 2 * c_custkey AS rec_id, c_name AS name
  FROM customer
  UNION ALL
  SELECT c_custkey, 2 * c_custkey + 1,
         substr(c_name, 1, 9 + c_custkey % 6) || 'x'
           || substr(c_name, 11 + c_custkey % 6)
  FROM customer
)
SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       CAST(CASE WHEN a.custkey = b.custkey THEN 1 ELSE 0 END AS BIGINT)
         AS same_entity
FROM recs a JOIN recs b
  ON substr(a.name, 16, 3) = substr(b.name, 16, 3) AND a.rec_id < b.rec_id
WHERE levenshtein(a.name, b.name) <= {LINKAGE_MAX_DIST}
"""


# ====================================================== badword filter
#
# Multi-pattern lexicon scan (the safety/blocklist content filter): a
# from-scratch Aho-Corasick automaton (functions/ahocorasick.py) counts
# every occurrence of every lexicon pattern in one pass per document —
# including NESTED patterns ('scan' also fires 'can'). Patterns are
# chosen borderless (no proper prefix = suffix), so occurrences cannot
# overlap *themselves* and the SQL non-overlapping replace-count is
# exact.

BADWORD_LEXICON = [
    "sort",
    "or",
    "merge",
    "erg",
    "slow",
    "low",
    "dup",
    "batch",
    "at",
    "scan",
    "can",
]
BADWORD_FLAG_MIN = 12


class BadwordScanner:
    """Actor-pool stage: automaton built ONCE per actor in __init__."""

    def __init__(self):
        from ..functions.ahocorasick import AhoCorasick

        self._ac = AhoCorasick(BADWORD_LEXICON)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # np.stack needs at least one row
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_hits": pd.Series([], dtype=np.int64),
                    "n_patterns": pd.Series([], dtype=np.int64),
                    "flagged": pd.Series([], dtype=np.int64),
                }
            )
        counts = np.stack(
            [self._ac.count_matches(t) for t in df["text"].tolist()]
        )
        n_hits = counts.sum(axis=1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_hits": n_hits.astype(np.int64),
                "n_patterns": (counts > 0).sum(axis=1).astype(np.int64),
                "flagged": (n_hits >= BADWORD_FLAG_MIN).astype(np.int64),
            }
        )


def q_badword_filter(sf_dir: str):
    """(doc_id, n_hits, n_patterns, flagged): per-document lexicon hit
    totals from one Aho-Corasick pass.

    Scale shape: stateful actor pool (automaton construction amortized
    across batches), no exchange; matching is O(text length) regardless
    of lexicon size — the property that makes AC the blocklist scanner
    at 100 TB where per-pattern regex passes are O(patterns x text)."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return d.map_batches(
        BadwordScanner, batch_format="pandas", concurrency=(1, 4)
    )


def _badword_sql() -> str:
    per = [
        f"(strlen(text) - strlen(replace(text, '{p}', ''))) // {len(p)}"
        for p in BADWORD_LEXICON
    ]
    hits = " + ".join(per)
    distinct = " + ".join(f"CASE WHEN {c} > 0 THEN 1 ELSE 0 END" for c in per)
    return f"""
SELECT doc_id,
  CAST({hits} AS BIGINT) AS n_hits,
  CAST({distinct} AS BIGINT) AS n_patterns,
  CAST(CASE WHEN {hits} >= {BADWORD_FLAG_MIN} THEN 1 ELSE 0 END AS BIGINT)
    AS flagged
FROM documents
"""


# ================================================== winnowing fingerprints
#
# Local document fingerprinting by winnowing (Schleimer, Wilkerson &
# Aiken, SIGMOD 2003 — the MOSS algorithm, public): hash every K-gram,
# slide a W-hash window, keep the RIGHTMOST minimal hash per window; the
# selected set is position-insensitive and guarantees any shared
# substring of length >= K + W - 1 shares a fingerprint. Complements the
# rolling-hash fingerprint_docs and MinHash ops with the
# guaranteed-detection sketch.

WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # window size (hashes)


def winnow_select(hashes: np.ndarray, w: int = WINNOW_W) -> np.ndarray:
    """Distinct selected gram positions (sorted). Rightmost-min rule;
    fewer than ``w`` hashes selects nothing (documents here are far
    longer; pinned by unit tests)."""
    n = len(hashes) - w + 1
    if n < 1:
        return np.empty(0, dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, w)[:n]
    # rightmost argmin = (w-1) - argmin over the reversed window
    right = (w - 1) - np.argmin(sw[:, ::-1], axis=1)
    return np.unique(np.arange(n, dtype=np.int64) + right)


def q_winnow_fingerprint(sf_dir: str):
    """(doc_id, n_grams, n_windows, n_selected, density_bp): winnowing
    fingerprint statistics per document; density_bp = selected grams per
    10k windows (the 2/(W+1) expected-density law made measurable).

    Scale shape: pure per-batch map — the K-gram hash pass and the
    vectorized sliding-window argmin never leave the task; a cross-doc
    match join on selected hashes would be the dup_ngram_coverage
    exchange shape."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def winnow(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        ng, nw, ns, dens = [], [], [], []
        for t in df["text"].tolist():
            grams = max(0, len(t) - WINNOW_K + 1)
            hs = np.array(
                [
                    int(
                        hashlib.md5(
                            ("wf|" + t[i : i + WINNOW_K]).encode("utf-8")
                        ).hexdigest()[:16],
                        16,
                    )
                    for i in range(grams)
                ],
                dtype=np.uint64,
            )
            sel = winnow_select(hs)
            wins = max(0, grams - WINNOW_W + 1)
            ng.append(grams)
            nw.append(wins)
            ns.append(len(sel))
            dens.append(10000 * len(sel) // wins if wins else 0)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_grams": pd.Series(ng, dtype=np.int64),
                "n_windows": pd.Series(nw, dtype=np.int64),
                "n_selected": pd.Series(ns, dtype=np.int64),
                "density_bp": pd.Series(dens, dtype=np.int64),
            }
        )

    return d.map_batches(winnow, batch_format="pandas")


WINNOW_FINGERPRINT_SQL = f"""
WITH d AS (
  SELECT doc_id, text,
         GREATEST(strlen(text) - {WINNOW_K - 1}, 0) AS n_grams
  FROM documents
), pos AS (
  SELECT doc_id, n_grams, i,
         {_md5u(f"'wf|' || substr(text, CAST(i AS INTEGER) + 1, {WINNOW_K})")} AS h
  FROM d, unnest(range(n_grams)) t(i)
), expand AS (
  SELECT doc_id, n_grams, i, h, i - k AS j
  FROM pos, unnest(range({WINNOW_W})) u(k)
  WHERE i - k BETWEEN 0 AND n_grams - {WINNOW_W}
), sel AS (
  SELECT doc_id, j, i,
         ROW_NUMBER() OVER (PARTITION BY doc_id, j ORDER BY h ASC, i DESC) AS rn
  FROM expand
), agg AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT CASE WHEN rn = 1 THEN i END) AS BIGINT) AS n_sel
  FROM sel GROUP BY doc_id
)
-- LEFT JOIN from documents: a doc with fewer than {WINNOW_W} k-grams has
-- no windows and must still emit its zeros row (review finding)
SELECT d.doc_id AS doc_id,
  CAST(d.n_grams AS BIGINT) AS n_grams,
  CAST(GREATEST(d.n_grams - {WINNOW_W - 1}, 0) AS BIGINT) AS n_windows,
  COALESCE(agg.n_sel, 0) AS n_selected,
  CAST(CASE WHEN d.n_grams - {WINNOW_W - 1} > 0
       THEN 10000 * COALESCE(agg.n_sel, 0) // (d.n_grams - {WINNOW_W - 1})
       ELSE 0 END AS BIGINT) AS density_bp
FROM d LEFT JOIN agg USING (doc_id)
"""


# ===================================================== crawl-trap filter
#
# The frontier's trap heuristics: kill URLs with runaway path depth,
# self-repeating segments (symlink/faceted-nav loops), stacked calendar
# dates (infinite archive pages), and volatile session-id params. One
# verdict per URL with rule precedence depth > loop > calendar >
# session; the corpus plants one family per doc_id % 5 and the oracle is
# the decision table (the Ray side PARSES the url).

TRAP_MAX_DEPTH = 8
_DATE_RE = None  # segments checked numerically, no regex needed


def classify_trap(url: str) -> str:
    rest = url.split("://", 1)[1]
    # split the query off FIRST: a no-path url ('h.com?sid=...') must not
    # lose its query to the path partition (review finding)
    rest, _, query = rest.partition("?")
    path = rest.partition("/")[2]
    segs = [s for s in path.split("/") if s]
    if len(segs) > TRAP_MAX_DEPTH:
        return "depth"
    run, prev = 1, None
    for s in segs:
        run = run + 1 if s == prev else 1
        prev = s
        if run >= 3:
            return "loop"
    triples = 0
    for a, b, c in zip(segs, segs[1:], segs[2:]):
        if (
            len(a) == 4
            and a.isdigit()
            and 1900 <= int(a) <= 2099
            and len(b) == 2
            and b.isdigit()
            and 1 <= int(b) <= 12
            and len(c) == 2
            and c.isdigit()
            and 1 <= int(c) <= 31
        ):
            triples += 1
    if triples >= 2:
        return "calendar"
    for kv in query.split("&") if query else []:
        v = kv.partition("=")[2]
        if len(v) == 32 and all(ch in "0123456789abcdef" for ch in v):
            return "session"
    return "ok"


def _trap_url(doc_id: int) -> str:
    host = f"https://site{doc_id % 7}.com"
    fam = doc_id % 5
    if fam == 0:
        # content-hash path segment (CDN style): a 32-hex token in the
        # PATH, so path_templates' {H} collapse is oracle-exercised
        # (ADVICE r3: the only hex token used to live in the ?sid= query,
        # which is stripped before the hex rule runs)
        hx = hashlib.md5(f"hex|{doc_id}".encode("utf-8")).hexdigest()
        return f"{host}/a/{hx}/c{doc_id}"
    if fam == 1:
        return host + "".join(f"/s{doc_id}x{k}" for k in range(12))
    if fam == 2:
        return f"{host}/cat/x/x/x/page{doc_id}"
    if fam == 3:
        return f"{host}/2024/01/05/2024/01/06/post{doc_id}"
    sid = hashlib.md5(f"sid|{doc_id}".encode("utf-8")).hexdigest()
    return f"{host}/page{doc_id}?sid={sid}"


def q_crawl_trap_filter(sf_dir: str):
    """(doc_id, url, verdict): trap classification per frontier URL.

    Scale shape: pure per-batch map, sits in the frontier expand stage
    before the seen-set exchange — every URL killed here never costs a
    shuffle slot downstream."""
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        urls = [_trap_url(int(i)) for i in ids]
        return pd.DataFrame(
            {
                "doc_id": ids,
                "url": pd.Series(urls, dtype=object),
                "verdict": pd.Series(
                    [classify_trap(u) for u in urls], dtype=object
                ),
            }
        )

    return d.map_batches(classify, batch_format="pandas")


def _crawl_trap_sql() -> str:
    segs = " || ".join(
        f"'/s' || CAST(doc_id AS VARCHAR) || 'x{k}'" for k in range(12)
    )
    return f"""
SELECT doc_id,
  'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.com' ||
  CASE doc_id % 5
    WHEN 0 THEN '/a/' || md5('hex|' || CAST(doc_id AS VARCHAR))
                || '/c' || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN {segs}
    WHEN 2 THEN '/cat/x/x/x/page' || CAST(doc_id AS VARCHAR)
    WHEN 3 THEN '/2024/01/05/2024/01/06/post' || CAST(doc_id AS VARCHAR)
    ELSE '/page' || CAST(doc_id AS VARCHAR) || '?sid='
         || md5('sid|' || CAST(doc_id AS VARCHAR))
  END AS url,
  CASE doc_id % 5
    WHEN 0 THEN 'ok' WHEN 1 THEN 'depth' WHEN 2 THEN 'loop'
    WHEN 3 THEN 'calendar' ELSE 'session' END AS verdict
FROM documents
"""


# ====================================================== activity trend
#
# Per-entity OLS slope over time, integer-exact: with x = epoch day and
# y = integer cents, the least-squares slope is the RATIONAL
# (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); emitting numerator and denominator
# as int64 sidesteps float division entirely (the decayed_counts
# philosophy applied to regression). The per-key feature-engineering
# shape every engagement/churn model computes.


def q_activity_trend(sf_dir: str):
    """(user_id, n, slope_num, slope_den, trend): exact rational OLS
    slope of value-cents over epoch-day per user; trend = sign(num)
    (den >= 0 always; 0 when a user's events share one day).

    Scale shape: the five sums are a per-batch combiner (one row per
    (batch, user)) -> ONE coarse exchange on user_id -> in-task sum;
    bodies/timestamps reduce to 40 bytes per user before the wire."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        y = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "sxy": x * y,
            }
        ).groupby("user_id", as_index=False).sum()
        return g.astype(np.int64)

    kd = _with_coarse_group(
        ev.map_batches(partial, batch_format="pandas"), "user_id"
    )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", as_index=False)[
            ["n", "sx", "sy", "sxx", "sxy"]
        ].sum()
        n = s["n"].to_numpy(np.int64)
        num = n * s["sxy"].to_numpy(np.int64) - s["sx"].to_numpy(
            np.int64
        ) * s["sy"].to_numpy(np.int64)
        den = n * s["sxx"].to_numpy(np.int64) - s["sx"].to_numpy(np.int64) ** 2
        return pd.DataFrame(
            {
                "user_id": s["user_id"].to_numpy(np.int64),
                "n": n,
                "slope_num": num,
                "slope_den": den,
                "trend": np.sign(num).astype(np.int64),
            }
        )

    return kd.groupby("_g").map_groups(reduce, batch_format="pandas")


ACTIVITY_TREND_SQL = """
WITH e AS (
  -- DuckDB's // on DOUBLE is plain division: floor explicitly
  SELECT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sx, CAST(SUM(c) AS BIGINT) AS sy,
         CAST(SUM(d * d) AS BIGINT) AS sxx,
         CAST(SUM(d * c) AS BIGINT) AS sxy
  FROM e GROUP BY user_id
)
SELECT user_id, n,
  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
  CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
            WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT) AS trend
FROM s
"""


# ================================================ consistent-hash ring
#
# The placement function a 256-node seen-set / cache tier uses: N nodes
# x V virtual nodes hash onto a ring; a key is owned by the successor
# vnode (first ring hash >= key hash, wrapping to the minimum). Adding
# or removing one node relocates only ~1/N of the keys — the property
# that makes frontier-shard rebalancing cheap mid-crawl.

CH_NODES = 8
CH_VNODES = 16


def _ring_points(n_nodes: int = CH_NODES) -> tuple[np.ndarray, np.ndarray]:
    """(sorted ring hashes, owning node per point)."""
    hs, owners = [], []
    for n in range(n_nodes):
        for v in range(CH_VNODES):
            hs.append(
                int(hashlib.md5(f"ring|{n}|{v}".encode("utf-8")).hexdigest()[:16], 16)
            )
            owners.append(n)
    order = np.argsort(np.array(hs, dtype=np.uint64), kind="stable")
    return (
        np.array(hs, dtype=np.uint64)[order],
        np.array(owners, dtype=np.int64)[order],
    )


def _ring_key_hashes(ids: np.ndarray) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(f"key|{int(i)}".encode("utf-8")).hexdigest()[:16], 16)
            for i in ids
        ],
        dtype=np.uint64,
    )


def _place_on_ring(ring: tuple[np.ndarray, np.ndarray], kh: np.ndarray) -> np.ndarray:
    """Successor-vnode placement (first ring hash >= key, wrap to the
    minimum) — the ONE placement function shared by assign and rebalance
    so the two operators stay provably consistent (review finding)."""
    ring_h, ring_n = ring
    idx = np.searchsorted(ring_h, kh, side="left")
    idx[idx == len(ring_h)] = 0
    return ring_n[idx]


def q_consistent_hash_assign(sf_dir: str):
    """(doc_id, node): successor-vnode ring placement of every doc key.

    Scale shape: the ring (N*V rows, bounded) is built on the driver and
    broadcast ONCE via ray.put; each batch places its keys with one
    np.searchsorted — placement is a pure map, no exchange, which is
    exactly why consistent hashing is the router shape: any task can
    place any key with 128 longs of state."""
    ring_ref = ray.put(_ring_points())
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        node = _place_on_ring(ray.get(ring_ref), _ring_key_hashes(ids))
        return pd.DataFrame({"doc_id": ids, "node": node})

    return d.map_batches(assign, batch_format="pandas")


CONSISTENT_HASH_SQL = f"""
WITH ring AS (
  SELECT n, {_md5u("'ring|' || CAST(n AS VARCHAR) || '|' || CAST(v AS VARCHAR)")} AS h
  FROM range({CH_NODES}) t(n), range({CH_VNODES}) u(v)
), keys AS (
  SELECT doc_id, {_md5u("'key|' || CAST(doc_id AS VARCHAR)")} AS kh FROM documents
)
SELECT k.doc_id AS doc_id,
  CAST(COALESCE(
    (SELECT arg_min(r.n, r.h) FROM ring r WHERE r.h >= k.kh),
    (SELECT arg_min(r.n, r.h) FROM ring r)) AS BIGINT) AS node
FROM keys k
"""


# ===================================================== Z-order indexing
#
# Morton-curve clustering (the Delta-Lake/Iceberg Z-ORDER shape): bit-
# interleave (user_id, epoch_day) so ranges of the curve are rectangles
# in key space — a reader filtering on EITHER dimension prunes most
# files. file_id = top 6 curve bits = the 64-way range partition a
# writer would emit.

ZORDER_BITS = 16
ZORDER_FILES_SHIFT = 2 * ZORDER_BITS - 6  # top 6 bits -> 64 files


def zorder_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of x (even positions) and y (odd)."""
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def q_zorder_index(sf_dir: str):
    """(event_id, zkey, file_id): Morton key of (user_id, epoch day) and
    the 64-way curve-range file assignment.

    Scale shape: pure vectorized per-batch map (16 shift/or passes);
    the subsequent cluster-write is the terasort exchange on zkey
    already demonstrated by epoch_shuffle."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def zorder(df: pd.DataFrame) -> pd.DataFrame:
        x = df["user_id"].to_numpy(np.int64) % (1 << ZORDER_BITS)
        y = (
            df["ts"].astype("int64").to_numpy() // 86_400_000_000
        ) % (1 << ZORDER_BITS)
        z = zorder_interleave(x, y)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "zkey": z,
                "file_id": z >> ZORDER_FILES_SHIFT,
            }
        )

    return ev.map_batches(zorder, batch_format="pandas")


def _zorder_sql() -> str:
    terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(ZORDER_BITS)
    )
    return f"""
WITH e AS (
  -- non-negative modulo (numpy semantics) even for pre-1970 timestamps
  SELECT event_id, ((user_id % {1 << ZORDER_BITS}) + {1 << ZORDER_BITS})
           % {1 << ZORDER_BITS} AS x,
         ((CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % {1 << ZORDER_BITS})
           + {1 << ZORDER_BITS}) % {1 << ZORDER_BITS} AS y
  FROM events
)
SELECT event_id, CAST({terms} AS BIGINT) AS zkey,
       CAST(({terms}) >> {ZORDER_FILES_SHIFT} AS BIGINT) AS file_id
FROM e
"""


# ============================================= distribution resampling
#
# Deterministic importance resampling to a target language mix (the
# CCNet/DoReMi data-mixing shape): per-language keep probability
# p_l = min(1, target_share_l * N / n_l), realized as an EXACT integer
# threshold on a per-doc md5 key — floor(p_l * 2^64) computed in
# arbitrary-precision integers on both sides, so the kept set is
# bit-reproducible (no float probability ever exists).

RESAMPLE_TARGET_BP = {"en": 3000, "de": 2000, "es": 2000, "fr": 2000, "zh": 1000}
_2_64 = 1 << 64


def q_distribution_resample(sf_dir: str):
    """(doc_id, lang, kept): kept=1 iff md5('rs|doc_id') falls under the
    language's exact integer threshold; languages above their target are
    downsampled toward it, languages at/below keep everything.

    Scale shape: a bounded lang-count groupby (|langs| rows) feeds the
    driver the thresholds, which broadcast via ray.put; the keep pass is
    a pure vectorized uint64 compare per batch. Two passes over a narrow
    projection, zero data-scaled driver state."""
    d = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    counts = {
        r["lang"]: r["count()"]
        for r in d.groupby("lang").count().take_all()
    }
    total = sum(counts.values())
    thresholds = {}
    for lang, n_l in counts.items():
        bp = RESAMPLE_TARGET_BP.get(lang, 0)
        thresholds[lang] = min(_2_64, (bp * total * _2_64) // (10000 * n_l))
    thr_ref = ray.put(thresholds)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(thr_ref)
        ids = df["doc_id"].to_numpy(np.int64)
        kh = np.array(
            [
                int(hashlib.md5(f"rs|{int(i)}".encode("utf-8")).hexdigest()[:16], 16)
                for i in ids
            ],
            dtype=np.uint64,
        )
        kept = np.zeros(len(ids), dtype=np.int64)
        for lang, t in thr.items():
            m = (df["lang"] == lang).to_numpy()
            if t >= _2_64:
                kept[m] = 1
            else:
                kept[m] = (kh[m] < np.uint64(t)).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "lang": df["lang"].to_numpy(), "kept": kept}
        )

    return d.map_batches(keep, batch_format="pandas")


def _distribution_resample_sql() -> str:
    bp_case = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in RESAMPLE_TARGET_BP.items()
    )
    return f"""
WITH c AS (
  SELECT doc_id, lang,
         COUNT(*) OVER (PARTITION BY lang) AS n_l,
         COUNT(*) OVER () AS total,
         CASE lang {bp_case} ELSE 0 END AS bp
  FROM documents
)
SELECT doc_id, lang,
  CAST(CASE WHEN {_md5u("'rs|' || CAST(doc_id AS VARCHAR)")} <
       LEAST(CAST({_2_64} AS HUGEINT),
             (CAST(bp AS HUGEINT) * total * CAST({_2_64} AS HUGEINT))
               // (10000 * n_l))
       THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM c
"""


# ========================================== prefix-preserving IP anonymization
#
# Crypto-PAn-style pseudonymization (Xu et al., ICNP 2002 — public
# scheme, md5 standing in for the AES PRF): output bit i = input bit i
# XOR prf(input bits 0..i-1), which preserves prefix relationships
# EXACTLY — two IPs share a k-bit anonymized prefix iff they shared a
# k-bit original prefix — the property that keeps subnet-level analytics
# valid over scrubbed crawl telemetry (complements pii_scrub's content
# redaction with structure-preserving field redaction).


def anonymize_ip(ip: int) -> int:
    bits = format(ip, "032b")
    out = 0
    for i in range(32):
        f = (
            int(hashlib.md5(("pan|" + bits[:i]).encode("utf-8")).hexdigest()[:16], 16)
            % 2
        )
        out = (out << 1) | ((ip >> (31 - i)) & 1) ^ f
    return out


def _dotted(ip: int) -> str:
    return ".".join(str((ip >> s) & 255) for s in (24, 16, 8, 0))


def q_ip_anonymize(sf_dir: str):
    """(user_id, ip, ip_anon): each distinct user's deterministic IPv4
    and its prefix-preserving pseudonym, both dotted-quad.

    Scale shape: distinct users via per-batch dedup + ONE coarse
    exchange (the seen-set shape); the 32-round PRF walk is per distinct
    user, not per event."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("user_id").astype({"user_id": np.int64})

    kd = _with_coarse_group(
        ev.map_batches(distinct_part, batch_format="pandas"), "user_id"
    )

    def anon(g: pd.DataFrame) -> pd.DataFrame:
        users = np.unique(g["user_id"].to_numpy(np.int64))
        ips = _ip32(users)
        return pd.DataFrame(
            {
                "user_id": users,
                "ip": [_dotted(int(p)) for p in ips],
                "ip_anon": [_dotted(anonymize_ip(int(p))) for p in ips],
            }
        )

    return kd.groupby("_g").map_groups(anon, batch_format="pandas")


def _ip_anonymize_sql() -> str:
    dotted = (
        lambda col: f"CAST(({col} >> 24) & 255 AS VARCHAR) || '.' || "
        f"CAST(({col} >> 16) & 255 AS VARCHAR) || '.' || "
        f"CAST(({col} >> 8) & 255 AS VARCHAR) || '.' || "
        f"CAST({col} & 255 AS VARCHAR)"
    )
    return f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), ips AS (
  SELECT user_id,
         CAST({_md5u("'ip|' || CAST(user_id AS VARCHAR)")} % 4294967296 AS BIGINT) AS ip
  FROM u
), bits AS (
  SELECT user_id, ip, i,
    xor((ip >> (31 - CAST(i AS INTEGER))) & 1,
        CAST({_md5u("'pan|' || substr(lpad(bin(ip), 32, '0'), 1, CAST(i AS INTEGER))")} % 2 AS BIGINT)) AS ob
  FROM ips, unnest(range(32)) t(i)
), anon AS (
  SELECT user_id, ip,
         CAST(SUM(ob << (31 - CAST(i AS INTEGER))) AS BIGINT) AS ipa
  FROM bits GROUP BY user_id, ip
)
SELECT user_id, {dotted('ip')} AS ip, {dotted('ipa')} AS ip_anon FROM anon
"""


# ====================================================== politeness audit
#
# The compliance check a crawl operator runs after the fact: per host
# (user_id standing in as the host key of the events stream), the PEAK
# number of requests inside any sliding 10-minute window — the number a
# rate-limit SLA is written against. Inclusive window [t-10min, t] with
# equal-timestamp peers counted, matching SQL RANGE framing exactly.

AUDIT_WINDOW_US = 10 * 60 * 1_000_000


def q_politeness_audit(sf_dir: str):
    """(user_id, n_events, peak_10m): max events in any trailing
    10-minute window per user.

    Scale shape: ONE coarse exchange on user_id; inside each task the
    window counts for ALL of a user's events come from two vectorized
    np.searchsorted passes over the sorted timestamps (no per-event
    rescan, no RANGE self-join)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    kd = _with_coarse_group(ev, "user_id")

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_n, out_p = [], [], []
        for uid, rows in g.groupby("user_id"):
            ts = np.sort(rows["ts"].astype("int64").to_numpy())
            hi = np.searchsorted(ts, ts, side="right")
            lo = np.searchsorted(ts, ts - AUDIT_WINDOW_US, side="left")
            out_u.append(uid)
            out_n.append(len(ts))
            out_p.append(int((hi - lo).max()) if len(ts) else 0)
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_u, dtype=np.int64),
                "n_events": pd.Series(out_n, dtype=np.int64),
                "peak_10m": pd.Series(out_p, dtype=np.int64),
            }
        )

    return kd.groupby("_g").map_groups(audit, batch_format="pandas")


POLITENESS_AUDIT_SQL = """
WITH w AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW) AS c
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(c) AS BIGINT) AS peak_10m
FROM w GROUP BY user_id
"""


def q_langid_confusion(sf_dir: str):
    """(true_lang, pred_lang, n_docs, row_bp): confusion matrix of the
    stopword language identifier against the labeled lang column;
    row_bp = basis points of the true language's docs landing in this
    cell (integer-exact recall diagonal).

    Scale shape: prediction is the existing per-batch langid map; the
    matrix is a bounded (|langs|^2) groupby after a per-batch cell
    combiner — evaluation costs one schema-bounded exchange."""
    from ray.data.aggregate import Sum as _Sum

    from .ml_queries import q_langid

    pred = q_langid(sf_dir)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["lang_actual", "lang_pred"], as_index=False)
            .size()
            .rename(
                columns={
                    "lang_actual": "true_lang",
                    "lang_pred": "pred_lang",
                    "size": "n",
                }
            )
        )
        return out.astype({"n": np.int64})

    m = (
        pred.map_batches(cells, batch_format="pandas")
        .groupby(["true_lang", "pred_lang"])
        .aggregate(_Sum("n", alias_name="n_docs"))
        .to_pandas()
    )  # bounded: |langs|^2 rows
    if m.empty:  # Ray's empty to_pandas() carries no columns
        return pd.DataFrame(
            {
                "true_lang": pd.Series([], dtype=object),
                "pred_lang": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "row_bp": pd.Series([], dtype=np.int64),
            }
        )
    totals = m.groupby("true_lang")["n_docs"].transform("sum").to_numpy(np.int64)
    m["n_docs"] = m["n_docs"].astype(np.int64)
    m["row_bp"] = 10000 * m["n_docs"].to_numpy(np.int64) // totals
    return m


def _langid_confusion_sql() -> str:
    from .ml_queries import LANGID_SQL

    return f"""
WITH pred AS ({LANGID_SQL}),
m AS (
  SELECT lang_actual AS true_lang, lang_pred AS pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT true_lang, pred_lang, n_docs,
  CAST(10000 * n_docs // SUM(n_docs) OVER (PARTITION BY true_lang) AS BIGINT)
    AS row_bp
FROM m
"""


# ======================================================= rank normalize
#
# Exact global RANK() (ties share the min rank) computed WITHOUT a
# global sort: the ranked column is value-bounded (document lengths), so
# a per-batch value-counts combiner -> one bounded histogram reduce ->
# broadcast rank-of-value lookup gives every row its exact rank in two
# narrow passes — the shuffle-free alternative to the terasort shape
# whenever the domain is bounded (the percentile-feature-normalization
# step of every quality-score blend).


def q_rank_normalize(sf_dir: str):
    """(doc_id, n_chars, rnk, pct_bp): RANK() by n_chars ascending and
    the basis-point percentile 10000*(rnk-1)//(N-1).

    Scale shape: histogram combiner (<= |distinct values| rows per
    batch) -> bounded groupby -> driver builds the <= |domain|-entry
    rank table -> ray.put broadcast -> vectorized map lookup. No
    all-to-all exchange touches data-scaled rows."""
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("n_chars", as_index=False).size()
        out.columns = ["n_chars", "n"]
        out["bucket"] = out["n_chars"] % 8  # 8 Ray groups, not |domain|
        return out.astype(np.int64)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_chars", as_index=False)["n"].sum()
        return out.astype(np.int64)

    counts = (
        d.map_batches(hist, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per distinct length
    if counts.empty:  # Ray's empty to_pandas() carries no columns
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_chars": pd.Series([], dtype=np.int64),
                "rnk": pd.Series([], dtype=np.int64),
                "pct_bp": pd.Series([], dtype=np.int64),
            }
        )
    counts = counts.sort_values("n_chars")
    n_total = int(counts["n"].sum())
    ranks = {}
    below = 0
    for v, n in zip(counts["n_chars"], counts["n"]):
        ranks[int(v)] = below + 1
        below += int(n)
    lookup_ref = ray.put((ranks, n_total))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ranks_, n_ = ray.get(lookup_ref)
        v = df["n_chars"].to_numpy(np.int64)
        r = np.array([ranks_[int(x)] for x in v], dtype=np.int64)
        pct = 10000 * (r - 1) // (n_ - 1) if n_ > 1 else np.zeros_like(r)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_chars": v,
                "rnk": r,
                "pct_bp": pct,
            }
        )

    return d.map_batches(assign, batch_format="pandas")


RANK_NORMALIZE_SQL = """
SELECT doc_id, n_chars,
  CAST(RANK() OVER (ORDER BY n_chars) AS BIGINT) AS rnk,
  CAST(10000 * (RANK() OVER (ORDER BY n_chars) - 1)
       // GREATEST(COUNT(*) OVER () - 1, 1) AS BIGINT) AS pct_bp
FROM documents
"""


# ========================================================= basket lift
#
# Association-rule mining over user event baskets: for every unordered
# event-type pair, lift = P(a,b) / (P(a) P(b)) over users — emitted as
# the exact integer (10000 * n_ab * N) // (n_a * n_b), so >10000 means
# positive association. The market-basket shape with a bounded type
# dimension: all heavy work collapses to per-user type sets.


def q_basket_lift(sf_dir: str):
    """(type_a, type_b, n_ab, lift_bp) for type_a < type_b.

    Scale shape: per-batch distinct (user, type) combiner -> ONE coarse
    exchange on user_id -> per-user pair fan-out (<= C(|types|,2) rows
    per user) -> bounded pair/single groupby; type counts and the user
    total ride the same exchange as tagged rows — one shuffle total."""
    from ray.data.aggregate import Sum as _Sum

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().astype({"user_id": np.int64})

    kd = _with_coarse_group(
        ev.map_batches(distinct_part, batch_format="pandas"), "user_id"
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, n = [], [], []
        for _, grp in g.drop_duplicates(["user_id", "event_type"]).groupby(
            "user_id"
        ):
            types = sorted(grp["event_type"].tolist())
            # the tagged-row encoding reserves these two values
            assert "__user__" not in types and "" not in types, (
                "basket_lift: event_type collides with the in-band "
                "sentinel values '__user__'/''"
            )
            rows_a.append("__user__")
            rows_b.append("")
            n.append(1)
            for i, a in enumerate(types):
                rows_a.append(a)
                rows_b.append("")
                n.append(1)
                for b in types[i + 1 :]:
                    rows_a.append(a)
                    rows_b.append(b)
                    n.append(1)
        return pd.DataFrame(
            {"a": rows_a, "b": rows_b, "n": pd.Series(n, dtype=np.int64)}
        )

    agg = (
        kd.groupby("_g")
        .map_groups(emit, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
    )  # bounded: 1 + |types| + C(|types|,2) rows
    if agg.empty:  # Ray's empty to_pandas() carries no columns
        return pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "n_ab": pd.Series([], dtype=np.int64),
                "lift_bp": pd.Series([], dtype=np.int64),
            }
        )
    n_users = int(agg.loc[agg["a"] == "__user__", "n"].iloc[0])
    singles = {
        r.a: int(r.n)
        for r in agg[(agg["b"] == "") & (agg["a"] != "__user__")].itertuples()
    }
    pairs = agg[agg["b"] != ""].copy()
    na = pairs["a"].map(singles).to_numpy(np.int64)
    nb = pairs["b"].map(singles).to_numpy(np.int64)
    nab = pairs["n"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "type_a": pairs["a"].to_numpy(),
            "type_b": pairs["b"].to_numpy(),
            "n_ab": nab,
            "lift_bp": 10000 * nab * n_users // (na * nb),
        }
    )


BASKET_LIFT_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
ta AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab,
  CAST(10000 * p.n_ab * nu.n_users // (t1.n_t * t2.n_t) AS BIGINT) AS lift_bp
FROM p, nu
JOIN ta t1 ON t1.event_type = p.type_a
JOIN ta t2 ON t2.event_type = p.type_b
"""


# ========================================================== Pareto docs
#
# Skyline query: documents not dominated in (length, quality) — the
# multi-criteria selection shape ("longest AND highest-quality
# representatives") that no single sort key expresses. quality is an
# md5-derived bounded score so both sides agree bit-for-bit.


def _pareto_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Local skyline, maximizing (n_chars, quality); strict dominance
    (ties on both dims survive together)."""
    if df.empty:  # empty blocks may arrive without columns
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_chars": pd.Series([], dtype=np.int64),
                "quality": pd.Series([], dtype=np.int64),
            }
        )
    df = df.sort_values(
        ["n_chars", "quality"], ascending=False, kind="mergesort"
    )
    keep_idx = []
    best_y = -1
    for x, grp in df.groupby("n_chars", sort=False):
        gmax = int(grp["quality"].max())
        if gmax > best_y:
            keep_idx.extend(grp.index[grp["quality"] == gmax].tolist())
            best_y = gmax
    return df.loc[sorted(keep_idx)]


def q_pareto_docs(sf_dir: str):
    """(doc_id, n_chars, quality): the Pareto frontier.

    Scale shape: per-batch local skyline (only frontier candidates
    survive — expected O(log^2 n) of a random batch), then one
    single-task global skyline over the union of candidates via
    repartition(1): the classic two-level skyline reduction; nothing
    data-scaled ever reaches one node."""
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def scored(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        q = np.array(
            [
                int(hashlib.md5(f"pq|{int(i)}".encode("utf-8")).hexdigest()[:16], 16)
                % 1000
                for i in ids
            ],
            dtype=np.int64,
        )
        return _pareto_frame(
            pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_chars": df["n_chars"].to_numpy(np.int64),
                    "quality": q,
                }
            )
        )

    cand = d.map_batches(scored, batch_format="pandas")
    return cand.repartition(1).map_batches(_pareto_frame, batch_format="pandas")


PARETO_DOCS_SQL = f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CAST({_md5u("'pq|' || CAST(doc_id AS VARCHAR)")} % 1000 AS BIGINT)
           AS quality
  FROM documents
)
SELECT a.doc_id AS doc_id, a.n_chars AS n_chars, a.quality AS quality
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE b.n_chars >= a.n_chars AND b.quality >= a.quality
    AND (b.n_chars > a.n_chars OR b.quality > a.quality)
)
"""


# ======================================================= ring rebalance
#
# The consistent-hashing theorem made measurable: adding one node to the
# ring relocates ONLY the keys the new node's vnodes capture (~1/(N+1)
# of them) and never moves a key between two old nodes — the property
# that lets a crawl add frontier shards mid-run without a global
# re-shuffle. Both placements computed per key; `moved` rows must all
# land on the new node (pinned by test and by the oracle itself).


def q_ring_rebalance(sf_dir: str):
    """(doc_id, node_before, node_after, moved): placement under N and
    N+1 nodes.

    Scale shape: both rings broadcast once; two searchsorted per batch —
    rebalance planning costs one narrow map pass, no exchange."""
    before_ref = ray.put(_ring_points(CH_NODES))
    after_ref = ray.put(_ring_points(CH_NODES + 1))
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        kh = _ring_key_hashes(ids)
        nb = _place_on_ring(ray.get(before_ref), kh)
        na = _place_on_ring(ray.get(after_ref), kh)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "node_before": nb,
                "node_after": na,
                "moved": (nb != na).astype(np.int64),
            }
        )

    return d.map_batches(assign, batch_format="pandas")


def _ring_rebalance_sql() -> str:
    vnode_h = _md5u("'ring|' || CAST(n AS VARCHAR) || '|' || CAST(v AS VARCHAR)")

    def ring(n_nodes: int) -> str:
        return (
            f"SELECT n, {vnode_h} AS h "
            f"FROM range({n_nodes}) t(n), range({CH_VNODES}) u(v)"
        )

    return f"""
WITH ring_a AS ({ring(CH_NODES)}), ring_b AS ({ring(CH_NODES + 1)}),
keys AS (
  SELECT doc_id, {_md5u("'key|' || CAST(doc_id AS VARCHAR)")} AS kh FROM documents
), placed AS (
  SELECT doc_id,
    CAST(COALESCE(
      (SELECT arg_min(r.n, r.h) FROM ring_a r WHERE r.h >= k.kh),
      (SELECT arg_min(r.n, r.h) FROM ring_a r)) AS BIGINT) AS node_before,
    CAST(COALESCE(
      (SELECT arg_min(r.n, r.h) FROM ring_b r WHERE r.h >= k.kh),
      (SELECT arg_min(r.n, r.h) FROM ring_b r)) AS BIGINT) AS node_after
  FROM keys k
)
SELECT doc_id, node_before, node_after,
  CAST(CASE WHEN node_before <> node_after THEN 1 ELSE 0 END AS BIGINT) AS moved
FROM placed
"""


# ==================================================== graph reciprocity
#
# Link-graph reciprocity: among distinct directed edges (self-loops
# excluded), the fraction whose reverse edge also exists — the
# mutual-linking signal that separates navigational site templates from
# organic cross-site links. Reuses the SAME rendered-page edge extraction
# as q_link_graph (the oracle rederives edges from the generation rule,
# so a parser slip breaks this gate too).


def q_graph_reciprocity(sf_dir: str):
    """One row: (n_edges, n_recip, recip_bp).

    Scale shape: edges bucket-exchange on the UNORDERED pair key, so
    both orientations of a pair land in one task; per-task counts reduce
    to two integers per bucket -> one bounded final sum."""
    import pyarrow.parquet as _pq

    from .queries import internal_edges_np

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    if n_docs == 0:
        return pd.DataFrame(
            {
                "n_edges": pd.Series([0], dtype=np.int64),
                "n_recip": pd.Series([0], dtype=np.int64),
                "recip_bp": pd.Series([0], dtype=np.int64),
            }
        )

    def edges(t: pa.Table) -> pd.DataFrame:
        # self-loops excluded for reciprocity
        src, dst = internal_edges_np(
            t.column("doc_id").to_numpy(), n_docs, drop_self=True
        )
        out = pd.DataFrame(
            {
                "src": pd.Series(src, dtype=np.int64),
                "dst": pd.Series(dst, dtype=np.int64),
            }
        ).drop_duplicates()
        out["pair"] = np.minimum(out["src"], out["dst"]) * np.int64(
            n_docs
        ) + np.maximum(out["src"], out["dst"])
        return out

    d = _read(sf_dir, "documents", columns=["doc_id"])
    kd = _with_coarse_group(d.map_batches(edges, batch_format="pyarrow"), "pair")

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"])
        fwd = set(zip(g["src"], g["dst"]))
        n_recip = sum(1 for s, t in fwd if (t, s) in fwd)
        return pd.DataFrame(
            {
                "n_edges": pd.Series([len(fwd)], dtype=np.int64),
                "n_recip": pd.Series([n_recip], dtype=np.int64),
            }
        )

    parts = kd.groupby("_g").map_groups(count_bucket, batch_format="pandas")
    tot = parts.sum(["n_edges", "n_recip"])  # bounded 2-scalar reduce
    n_edges = int(tot["sum(n_edges)"] or 0)
    n_recip = int(tot["sum(n_recip)"] or 0)
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype=np.int64),
            "n_recip": pd.Series([n_recip], dtype=np.int64),
            "recip_bp": pd.Series(
                [10000 * n_recip // n_edges if n_edges else 0], dtype=np.int64
            ),
        }
    )


GRAPH_RECIPROCITY_SQL = """
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (
  SELECT doc_id,
    CAST(1 + CAST(concat('0x', substr(md5('lnkk:42:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % 4 AS BIGINT) AS k
  FROM documents
),
e AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id
),
r AS (
  SELECT (SELECT COUNT(*) FROM e) AS n_edges,
         (SELECT COUNT(*) FROM e a JOIN e b
            ON a.src = b.dst AND a.dst = b.src) AS n_recip
)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_recip AS BIGINT) AS n_recip,
       CAST(CASE WHEN n_edges > 0 THEN 10000 * n_recip // n_edges
            ELSE 0 END AS BIGINT) AS recip_bp
FROM r
"""


# ======================================================= token Simpson
#
# Lexical-concentration index per document: Simpson / Herfindahl
# collision probability over whitespace tokens, the integer-exact
# rational sum(c_i*(c_i-1)) / (n*(n-1)) — the "repeated-token mass"
# quality signal complementing repetition_stats' dup-line/bigram view
# (a keyword-stuffed or template page scores high; no log, no float).


def q_token_simpson(sf_dir: str):
    """(doc_id, n_tokens, simpson_bp): basis points of the probability
    two random tokens of the doc coincide.

    Scale shape: pure per-batch map; per-doc value_counts is the whole
    computation."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def simpson(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nt, bp = [], []
        for t in df["text"].tolist():
            toks = t.split(" ") if t else []
            toks = [x for x in toks if x]
            n = len(toks)
            nt.append(n)
            if n < 2:
                bp.append(0)
                continue
            _, c = np.unique(np.array(toks, dtype=object), return_counts=True)
            num = int((c * (c - 1)).sum())
            bp.append(10000 * num // (n * (n - 1)))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": pd.Series(nt, dtype=np.int64),
                "simpson_bp": pd.Series(bp, dtype=np.int64),
            }
        )

    return d.map_batches(simpson, batch_format="pandas")


TOKEN_SIMPSON_SQL = """
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
         unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
), cc AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
), s AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS num
  FROM cc GROUP BY 1
)
SELECT d.doc_id AS doc_id,
  COALESCE(s.n, 0) AS n_tokens,
  CAST(CASE WHEN COALESCE(s.n, 0) > 1 THEN 10000 * s.num // (s.n * (s.n - 1))
       ELSE 0 END AS BIGINT) AS simpson_bp
FROM documents d LEFT JOIN s USING (doc_id)
"""


# ===================================================== quantile mapping
#
# Cross-source quantile normalization: map every document's length onto
# the GLOBAL length distribution at the same within-source percentile —
# the curation step that makes per-source quality thresholds comparable
# when sources have wildly different length profiles. Exact integer
# CDFs in basis points; mapped value = smallest global value whose
# global CDF reaches the doc's within-source CDF.


def q_quantile_map(sf_dir: str):
    """(doc_id, source, n_chars, mapped_chars).

    Scale shape: TWO bounded histogram reduces (per-(source, value) and
    global-value counts — both schema-bounded, never data-scaled), the
    mapping table built on the driver with one vectorized searchsorted
    per source, broadcast once; the apply pass is a dict lookup map."""
    d = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "n_chars"], as_index=False).size()
        out.columns = ["source", "n_chars", "n"]
        return out.astype({"n_chars": np.int64, "n": np.int64})

    def merge_source(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["source", "n_chars"], as_index=False)["n"].sum()
        return out.astype({"n_chars": np.int64, "n": np.int64})

    # Ray groupby keyed on source ONLY (|sources| groups); the
    # (source, value) merge happens inside the group task — a
    # (source, value)-keyed Ray groupby costs ~100x more groups
    counts = (
        d.map_batches(hist, batch_format="pandas")
        .groupby("source")
        .map_groups(merge_source, batch_format="pandas")
        .to_pandas()
    )  # bounded: |sources| x |distinct lengths|
    if counts.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "source": pd.Series([], dtype=object),
                "n_chars": pd.Series([], dtype=np.int64),
                "mapped_chars": pd.Series([], dtype=np.int64),
            }
        )
    counts = counts.sort_values(["source", "n_chars"])
    gl = (
        counts.groupby("n_chars", as_index=False)["n"].sum().sort_values("n_chars")
    )
    g_total = int(gl["n"].sum())
    g_vals = gl["n_chars"].to_numpy(np.int64)
    g_cdf = 10000 * gl["n"].cumsum().to_numpy(np.int64) // g_total
    mapping: dict[tuple[str, int], int] = {}
    for src, grp in counts.groupby("source"):
        s_total = int(grp["n"].sum())
        s_cdf = 10000 * grp["n"].cumsum().to_numpy(np.int64) // s_total
        # smallest global value with g_cdf >= s_cdf
        idx = np.searchsorted(g_cdf, s_cdf, side="left")
        for v, m in zip(grp["n_chars"].to_numpy(np.int64), g_vals[idx]):
            mapping[(src, int(v))] = int(m)
    map_ref = ray.put(mapping)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        mp = ray.get(map_ref)
        src = df["source"].tolist()
        v = df["n_chars"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "source": src,
                "n_chars": v,
                "mapped_chars": pd.Series(
                    [mp[(s, int(x))] for s, x in zip(src, v)], dtype=np.int64
                ),
            }
        )

    return d.map_batches(apply, batch_format="pandas")


QUANTILE_MAP_SQL = """
WITH gh AS (
  SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1
), g AS (
  SELECT v, CAST(10000 * SUM(c) OVER (ORDER BY v)
                 // (SELECT SUM(c) FROM gh) AS BIGINT) AS cdf
  FROM gh
), sh AS (
  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
), sc AS (
  SELECT source, v,
         CAST(10000 * SUM(c) OVER (PARTITION BY source ORDER BY v)
              // SUM(c) OVER (PARTITION BY source) AS BIGINT) AS cdf
  FROM sh
), map AS (
  SELECT sc.source, sc.v, MIN(g.v) AS mapped
  FROM sc JOIN g ON g.cdf >= sc.cdf
  GROUP BY 1, 2
)
SELECT d.doc_id AS doc_id, d.source AS source, d.n_chars AS n_chars,
       m.mapped AS mapped_chars
FROM documents d
JOIN map m ON m.source = d.source AND m.v = d.n_chars
"""


# ==================================================== JSON props stats
#
# Semi-structured payload extraction: the events table's `props` column
# is a JSON string (the universal telemetry escape hatch); parse it with
# a REAL json decode on the Ray side (the oracle uses DuckDB's
# json_extract) and aggregate the extracted field per event type. The
# value domain is bounded, so the whole aggregate is a per-batch
# (type, k) histogram combiner -> one schema-bounded groupby -> stats
# derived from the histogram (distinct/min/max/sum without a second
# pass).


def q_props_stats(sf_dir: str):
    """(event_type, n_events, sum_k, min_k, max_k, n_distinct_k).

    Perf note: the per-batch combiner keys the Ray groupby on
    event_type ONLY (|types| groups) and sums the k-histogram inside
    the group task — a groupby keyed on (type, k) costs ~100x more Ray
    groups for the same result (measured 5.8 s -> 1.4 s at sf0.1)."""
    import json as _json

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        ks = [int(_json.loads(p)["k"]) for p in df["props"].tolist()]
        out = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "k": ks})
            .groupby(["event_type", "k"], as_index=False)
            .size()
        )
        out.columns = ["event_type", "k", "n"]
        return out.astype({"k": np.int64, "n": np.int64})

    def merge_type(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["event_type", "k"], as_index=False)["n"].sum()
        return out.astype({"k": np.int64, "n": np.int64})

    h = (
        ev.map_batches(hist, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge_type, batch_format="pandas")
        .to_pandas()
    )  # bounded: |types| x |k domain|
    if h.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "sum_k": pd.Series([], dtype=np.int64),
                "min_k": pd.Series([], dtype=np.int64),
                "max_k": pd.Series([], dtype=np.int64),
                "n_distinct_k": pd.Series([], dtype=np.int64),
            }
        )
    g = h.groupby("event_type")
    out = pd.DataFrame(
        {
            "event_type": list(g.groups.keys()),
            "n_events": g["n"].sum().to_numpy(np.int64),
            "sum_k": g.apply(
                lambda x: int((x["k"] * x["n"]).sum()), include_groups=False
            ).to_numpy(np.int64),
            "min_k": g["k"].min().to_numpy(np.int64),
            "max_k": g["k"].max().to_numpy(np.int64),
            "n_distinct_k": g["k"].nunique().to_numpy(np.int64),
        }
    )
    return out.reset_index(drop=True)


PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(MIN(k) AS BIGINT) AS min_k,
  CAST(MAX(k) AS BIGINT) AS max_k,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM e GROUP BY event_type
"""


# ========================================================== k-core peel
#
# k-core decomposition (k=3) of the undirected link graph by iterative
# peeling: drop degree-<3 nodes, delete their incident edges, repeat —
# the graph-cleaning pass that strips crawl tendrils/leaf chains before
# community or centrality analysis. Defined as KCORE_ROUNDS-round
# peeling (the fixpoint is reached in 3 rounds here; the Ray side
# early-exits on a no-removal round, which equals running all rounds —
# converged SQL rounds are idempotent, so both sides agree under the
# cap by construction).

KCORE_K = 3
KCORE_ROUNDS = 12
_KCORE_NB = 64


def q_kcore_peel(sf_dir: str):
    """(doc_id, in_core): 1 iff the doc survives 3-core peeling of the
    distinct undirected link graph (self-loops excluded; isolated docs
    are 0).

    Scale shape: the dedup_clusters Pregel structure — undirected edges
    live bucketed by endpoint (both directions stored, so a node's
    degree is bucket-LOCAL); each round's task applies incoming removal
    notifications, recomputes resident degrees, peels, and emits
    notifications keyed by the OTHER endpoint's bucket — one bucket
    exchange per round, convergence read from a per-round notification
    count scalar; membership output via the shared partitioned
    anti-join. No edge list or node set ever reaches the driver."""
    import pyarrow.parquet as _pq

    from .queries import internal_edges_np

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    d = _read(sf_dir, "documents", columns=["doc_id"])
    if n_docs == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "in_core": pd.Series([], dtype=np.int64),
            }
        )
    empty_state = pd.DataFrame(
        {
            "kind": pd.Series([], dtype=np.int64),
            "src": pd.Series([], dtype=np.int64),
            "dst": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
        }
    )

    def edges(t: pa.Table) -> pd.DataFrame:
        # self-loops never contribute to a core
        src, dst = internal_edges_np(
            t.column("doc_id").to_numpy(), n_docs, drop_self=True
        )
        e = pd.DataFrame(
            {
                "src": pd.Series(src, dtype=np.int64),
                "dst": pd.Series(dst, dtype=np.int64),
            }
        )
        e = pd.concat(
            [e, e.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
        ).drop_duplicates()
        e.insert(0, "kind", np.int64(0))
        e["b"] = e["src"].to_numpy(np.int64) % _KCORE_NB
        return e

    def peel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["kind"] == 0]
        dead_in = set(g.loc[g["kind"] == 1, "dst"].tolist())
        if dead_in:
            ed = ed[~ed["dst"].isin(dead_in)]
        # duplicate edges across rounds are impossible (distinct at
        # build, filters only remove), so degree = row count per src
        deg = ed.groupby("src")["dst"].size()
        dead = set(deg[deg < KCORE_K].index)
        if not dead:
            return ed if not ed.empty else empty_state
        dying = ed[ed["src"].isin(dead)]
        keep = ed[~ed["src"].isin(dead)]
        notif = pd.DataFrame(
            {
                "kind": np.int64(1),
                "src": np.int64(-1),
                "dst": dying["src"].to_numpy(np.int64),
                "b": dying["dst"].to_numpy(np.int64) % _KCORE_NB,
            }
        ).drop_duplicates(["dst", "b"])
        out = pd.concat([keep, notif], ignore_index=True)
        return out if not out.empty else empty_state

    from .pregel import pregel_loop

    state = d.map_batches(edges, batch_format="pyarrow")
    # notifications carry kind=1, so the output kind-sum IS the pending-
    # removal count; the shared helper reads it from the exchange itself
    state, _, n_notif = pregel_loop(
        state, lambda i: peel_bucket, key="b", changed_col="kind",
        max_iters=KCORE_ROUNDS,
    )
    if n_notif:
        # the cap bound with removals still propagating: membership is
        # NOT the fixpoint and the (same-depth) SQL oracle may disagree
        # — make the divergence loud instead of silent (review finding)
        import logging

        logging.getLogger(__name__).warning(
            "kcore_peel: %d removal notifications still pending after %d "
            "rounds — result is the capped peel, not the fixpoint",
            int(n_notif),
            KCORE_ROUNDS,
        )
    alive = state.map_batches(
        lambda g: g.loc[g["kind"] == 0, ["src"]].drop_duplicates(),
        batch_format="pandas",
    )
    dead_docs = partitioned_anti_join(d, alive, "doc_id", "src", "doc_id")

    def tag(flag: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            col = "src" if "src" in df.columns else "doc_id"
            ids = (
                df[col].to_numpy(np.int64)
                if len(df)
                else np.array([], dtype=np.int64)
            )
            return pd.DataFrame(
                {
                    "doc_id": np.unique(ids),
                    "in_core": np.full(
                        len(np.unique(ids)), flag, dtype=np.int64
                    ),
                }
            )

        return fn

    # alive sides: distinct per bucket already; global distinct via the
    # same bucket co-location (src rows of one node live in one bucket)
    return alive.map_batches(tag(1), batch_format="pandas").union(
        dead_docs.map_batches(tag(0), batch_format="pandas")
    )


def _kcore_sql(rounds: int = KCORE_ROUNDS) -> str:
    md5u = (
        "CAST(concat('0x', substr(md5('lnkk:42:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)"
    )
    parts = [
        f"""WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id
),
e0 AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de)"""
    ]
    for r in range(rounds):
        # AS MATERIALIZED: DuckDB inlines plain CTEs, and each round
        # references the previous one three times — unmaterialized, the
        # plan (and parquet re-opens) grows 3^rounds
        parts.append(
            f"""x{r} AS MATERIALIZED (
  SELECT src FROM (SELECT src, COUNT(*) AS c FROM e{r} GROUP BY 1) WHERE c < {KCORE_K}
),
e{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r} e
  WHERE e.src NOT IN (SELECT src FROM x{r})
    AND e.dst NOT IN (SELECT src FROM x{r})
)"""
        )
    final = f"""
SELECT d.doc_id AS doc_id,
  CAST(CASE WHEN d.doc_id IN (SELECT src FROM e{rounds}) THEN 1 ELSE 0 END
       AS BIGINT) AS in_core
FROM documents d
"""
    return ",\n".join(parts) + final


# ========================================================== burst days
#
# Per-entity burst detection: a (user, day) is a burst when its event
# count exceeds 3x the user's own mean over their ACTIVE days — the
# integer cross-multiplied rule n * n_active_days > 3 * total_events
# (no float rate ever computed). The crawl-telemetry anomaly shape
# (which hosts hammered us, which days).


def q_burst_days(sf_dir: str):
    """(user_id, day, n, burst).

    Scale shape: per-batch (user, day) count combiner -> ONE coarse
    exchange on user_id -> in-task user totals + vectorized flag."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            }
        ).groupby(["user_id", "day"], as_index=False).size()
        out.columns = ["user_id", "day", "n"]
        return out.astype(np.int64)

    kd = _with_coarse_group(
        ev.map_batches(partial, batch_format="pandas"), "user_id"
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "day"], as_index=False)["n"].sum()
        tot = s.groupby("user_id")["n"].transform("sum").to_numpy(np.int64)
        nd = s.groupby("user_id")["day"].transform("size").to_numpy(np.int64)
        n = s["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": s["user_id"].to_numpy(np.int64),
                "day": s["day"].to_numpy(np.int64),
                "n": n,
                "burst": (n * nd > 3 * tot).astype(np.int64),
            }
        )

    return kd.groupby("_g").map_groups(flag, batch_format="pandas")


BURST_DAYS_SQL = """
WITH ud AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, n,
  CAST(CASE WHEN n * COUNT(*) OVER (PARTITION BY user_id)
            > 3 * SUM(n) OVER (PARTITION BY user_id)
       THEN 1 ELSE 0 END AS BIGINT) AS burst
FROM ud
"""


# ====================================================== radix quantiles
#
# Mergeable quantile sketch for UNBOUNDED domains: a log2-bucket (radix)
# histogram — at most 64 buckets no matter the value range — with
# integer linear interpolation inside the picked bucket. This is the
# scale path where the exact value-histogram quantile operators
# (length_quantiles / group_quantiles / rank_normalize) stop working:
# their state is O(|distinct values|), this is O(64) with a bounded
# relative error (one power-of-two bucket), deterministic and
# merge-order-independent (bucket counts are sums).

RADIX_QS_BP = [2500, 5000, 7500, 9900]


def radix_hist(values: np.ndarray) -> pd.DataFrame:
    """(b, n) log2-bucket counts of positive int64 values. Exact
    floor(log2) via the frexp exponent (ints < 2^53 are exact in
    float64; np.log2+floor can misround at 2^k-1 boundaries)."""
    v = np.maximum(values.astype(np.int64), 1)
    b = np.frexp(v.astype(np.float64))[1] - 1
    out = pd.DataFrame({"b": b.astype(np.int64)}).groupby("b", as_index=False).size()
    out.columns = ["b", "n"]
    return out.astype(np.int64)


def radix_interp(h: pd.DataFrame, est_col: str) -> pd.DataFrame:
    """(q_bp, bucket, <est_col>) quantile estimates from a merged (b, n)
    radix histogram — integer linear interpolation inside the picked
    bucket."""
    if h.empty:
        return pd.DataFrame(
            {
                "q_bp": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=np.int64),
                est_col: pd.Series([], dtype=np.int64),
            }
        )
    h = h.sort_values("b")
    bs = h["b"].to_numpy(np.int64)
    ns = h["n"].to_numpy(np.int64)
    cum = np.cumsum(ns)
    total = int(cum[-1])
    rows = []
    for q in RADIX_QS_BP:
        rk = (total - 1) * q // 10000
        i = int(np.searchsorted(cum, rk, side="right"))  # first cum > rk
        b, n, before = int(bs[i]), int(ns[i]), int(cum[i] - ns[i])
        est = (1 << b) + ((rk - before) * (1 << b)) // n
        rows.append((q, b, est))
    return pd.DataFrame(
        {
            "q_bp": pd.Series([r[0] for r in rows], dtype=np.int64),
            "bucket": pd.Series([r[1] for r in rows], dtype=np.int64),
            est_col: pd.Series([r[2] for r in rows], dtype=np.int64),
        }
    )


def _merge_radix_hist(ds: ray.data.Dataset) -> pd.DataFrame:
    """Merge per-batch (b, n) partials: <= 64 Ray groups by design."""
    from ray.data.aggregate import Sum as _Sum

    h = ds.groupby("b").aggregate(_Sum("n", alias_name="n")).to_pandas()
    return h if not h.empty else pd.DataFrame({"b": [], "n": []})


def q_radix_quantiles(sf_dir: str):
    """(q_bp, bucket, est_cents): radix-sketch quantile estimates of the
    event value in cents.

    Scale shape: per-batch 64-bucket count combiner -> bounded groupby
    -> driver interpolation over 64 rows. Merge = integer vector add,
    so shard/epoch sketches combine exactly (the HLL/CMS property for
    quantiles)."""
    ev = _read(sf_dir, "events", columns=["value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return radix_hist(cents)

    h = _merge_radix_hist(ev.map_batches(hist, batch_format="pandas"))
    return radix_interp(h, "est_cents")


def _radix_sql(cents_cte: str, est_col: str) -> str:
    """Full radix-quantile SQL given a CTE chain ending in c(cents) —
    shared by radix_quantiles and funnel_latency."""
    qlist = ", ".join(str(q) for q in RADIX_QS_BP)
    return f"""
WITH {cents_cte}, h AS (
  SELECT CAST(strlen(bin(cents)) - 1 AS BIGINT) AS b, COUNT(*) AS n
  FROM c GROUP BY 1
), cumh AS (
  SELECT b, CAST(n AS BIGINT) AS n,
         CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cum
  FROM h
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
qs AS (SELECT unnest([{qlist}]) AS q),
r AS (SELECT q, (total - 1) * q // 10000 AS rk FROM qs, t),
pick AS (
  SELECT r.q, r.rk, MIN(c.b) AS b
  FROM r JOIN cumh c ON c.cum > r.rk GROUP BY 1, 2
)
SELECT CAST(p.q AS BIGINT) AS q_bp, p.b AS bucket,
  CAST((CAST(1 AS BIGINT) << p.b)
       + ((p.rk - (c.cum - c.n)) * (CAST(1 AS BIGINT) << p.b)) // c.n
       AS BIGINT) AS {est_col}
FROM pick p JOIN cumh c ON c.b = p.b
"""


_RADIX_CENTS_CTE = """c AS (
  SELECT GREATEST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 1) AS cents
  FROM events
)"""


# ====================================================== funnel latency
#
# Time-to-convert distribution: for every user completing the full
# greedy earliest-chain funnel (corpus_ops.q_funnel_counts semantics),
# the latency from stage-1 to final-stage timestamp, summarized through
# the SAME radix quantile sketch as radix_quantiles — the composition a
# product-analytics pipeline runs ("how long does conversion take at
# p50/p99") with unbounded latencies and bounded sketch state.


def q_funnel_latency(sf_dir: str):
    """(q_bp, bucket, est_us): radix-quantile estimates of the
    signup->purchase latency in microseconds over converting users.

    Scale shape: the funnel chain runs inside ONE coarse user exchange
    (vectorized min-join per stage); each task emits its <= 64-bucket
    latency histogram; bounded merge + driver interpolation."""
    from .corpus_ops import FUNNEL_STAGES

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    kd = _with_coarse_group(ev, "user_id")

    def lat_hist(g: pd.DataFrame) -> pd.DataFrame:
        first = (
            g[g["event_type"] == FUNNEL_STAGES[0]].groupby("user_id")["ts"].min()
        )
        cur = first
        for st in FUNNEL_STAGES[1:]:
            nxt = (
                g.loc[g["event_type"] == st, ["user_id", "ts"]]
                .merge(cur.rename("prev"), left_on="user_id", right_index=True)
                .reset_index(drop=True)
            )
            cur = nxt[nxt["ts"] > nxt["prev"]].groupby("user_id")["ts"].min()
        if cur.empty:
            return pd.DataFrame(
                {"b": pd.Series([], dtype=np.int64), "n": pd.Series([], dtype=np.int64)}
            )
        lat = (
            cur.astype("int64") - first.loc[cur.index].astype("int64")
        ).to_numpy(np.int64)
        return radix_hist(lat)

    h = _merge_radix_hist(
        kd.groupby("_g").map_groups(lat_hist, batch_format="pandas")
    )
    return radix_interp(h, "est_us")


def _funnel_latency_sql() -> str:
    chain = """t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.ts > t1.t GROUP BY 1),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'click' AND e.ts > t2.t GROUP BY 1),
t4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t3 ON e.user_id = t3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t3.t GROUP BY 1),
c AS (
  SELECT GREATEST(epoch_us(t4.t) - epoch_us(t1.t), 1) AS cents
  FROM t4 JOIN t1 USING (user_id)
)"""
    return _radix_sql(chain, "est_us")


# ====================================================== minhash error
#
# Sketch-accuracy evaluation: for every surviving MinHash candidate
# pair, the signature-agreement ESTIMATE of Jaccard (n_agree/128) next
# to the EXACT distinct-shingle Jaccard, both in integer basis points —
# the measurement that justifies (or indicts) the sketch parameters
# before a 100 TB dedup run trusts them. Composes the two existing
# operators; the pair sets are identical by construction (same
# min_agree gate), joined through one coarse exchange.


def q_minhash_error(sf_dir: str):
    """(doc_a, doc_b, est_bp, exact_bp, err_bp) per candidate pair;
    err_bp = est - exact (signed).

    Scale shape: q_dedup_verify threads n_agree through its two bucket
    joins (return_agree=True), so the whole evaluation costs exactly ONE
    dedup_verify run plus a stateless map — no second candidate pass,
    no reconciliation exchange (first version ran the machinery twice:
    22 s -> ~10 s at sf0.1)."""
    from ..functions.dedup import N_PERM
    from .ml_queries import q_dedup_verify

    full = q_dedup_verify(sf_dir, return_agree=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        na = df["n_agree"].to_numpy(np.int64)
        ni = df["n_inter"].to_numpy(np.int64)
        nu = df["n_union"].to_numpy(np.int64)
        est = 10000 * na // N_PERM
        ex = np.where(nu > 0, 10000 * ni // np.maximum(nu, 1), 0)
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].to_numpy(np.int64),
                "doc_b": df["doc_b"].to_numpy(np.int64),
                "est_bp": est,
                "exact_bp": ex,
                "err_bp": est - ex,
            }
        )

    return full.map_batches(finish, batch_format="pandas")


def _minhash_error_sql(min_agree: int = 26) -> str:
    from ..functions.dedup import N_PERM
    from .ml_queries import _dedup_minhash_sql

    base = _dedup_minhash_sql(min_agree)
    needle = "SELECT doc_a, doc_b, n_agree, CAST(0 AS BIGINT) AS n_capped\nFROM agree"
    assert needle in base, (
        "_dedup_minhash_sql's final SELECT was reformatted — update the "
        "splice needle in _minhash_error_sql (review finding: a silent "
        "empty-head rpartition produces an unparseable oracle)"
    )
    head, _, _tail = base.rpartition(needle)
    return (
        head
        + f""", surv AS (
  SELECT doc_a, doc_b, n_agree FROM agree WHERE n_agree >= {min_agree}
),
hd AS (SELECT DISTINCT doc_id, h FROM hh),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM hd GROUP BY doc_id),
ov AS (
  SELECT s.doc_a, s.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM surv s
  JOIN hd a ON a.doc_id = s.doc_a
  JOIN hd b ON b.doc_id = s.doc_b AND b.h = a.h
  GROUP BY 1, 2
), f AS (
  SELECT s.doc_a, s.doc_b,
    CAST(10000 * s.n_agree // {N_PERM} AS BIGINT) AS est_bp,
    CAST(CASE WHEN za.n + zb.n - COALESCE(ov.n_inter, 0) > 0
         THEN 10000 * COALESCE(ov.n_inter, 0)
              // (za.n + zb.n - COALESCE(ov.n_inter, 0))
         ELSE 0 END AS BIGINT) AS exact_bp
  FROM surv s
  LEFT JOIN ov ON ov.doc_a = s.doc_a AND ov.doc_b = s.doc_b
  JOIN sz za ON za.doc_id = s.doc_a
  JOIN sz zb ON zb.doc_id = s.doc_b
)
SELECT doc_a, doc_b, est_bp, exact_bp,
       CAST(est_bp - exact_bp AS BIGINT) AS err_bp
FROM f
"""
    )


# ================================================= join-size estimation
#
# Sampling-based cardinality estimation (the query-planner primitive):
# |orders ⋈ lineitem| = Σ_k a_k·b_k; hashing the join key into a 1/16
# deterministic sample and scaling by 16 gives the estimate a planner
# would use to choose broadcast vs shuffle — emitted NEXT TO the exact
# size so the error is measurable (the minhash_error philosophy applied
# to join planning).

JS_MOD = 16


def q_join_size_estimate(sf_dir: str):
    """One row: (est_rows, exact_rows, err_bp) for orders ⋈ lineitem on
    orderkey; err_bp = 10000*|est-exact|//exact.

    Scale shape: per-batch per-key count combiners on BOTH sides -> ONE
    coarse exchange on the key -> in-task Σ a_k·b_k partials (sampled
    and full) -> bounded 2-scalar reduce. The payload never moves — only
    (key, count) pairs do."""
    o = _read(sf_dir, "orders", columns=["o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def side_counts(col: str, side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(col, as_index=False).size()
            out.columns = ["key", "n"]
            out["side"] = np.int8(side)
            return out.astype({"key": np.int64, "n": np.int64})

        return fn

    both = o.map_batches(side_counts("o_orderkey", 0), batch_format="pandas").union(
        li.map_batches(side_counts("l_orderkey", 1), batch_format="pandas")
    )
    kd = _with_coarse_group(both, "key")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["key", "side"], as_index=False)["n"].sum()
        p = m.pivot_table(index="key", columns="side", values="n", fill_value=0)
        a = p[0].to_numpy(np.int64) if 0 in p.columns else np.zeros(len(p), np.int64)
        b = p[1].to_numpy(np.int64) if 1 in p.columns else np.zeros(len(p), np.int64)
        keys = p.index.to_numpy(np.int64)
        prod = a * b
        sampled = np.array(
            [
                int(hashlib.md5(f"js|{int(k)}".encode("utf-8")).hexdigest()[:16], 16)
                % JS_MOD
                == 0
                for k in keys
            ]
        )
        return pd.DataFrame(
            {
                "exact_part": pd.Series([int(prod.sum())], dtype=np.int64),
                "sample_part": pd.Series(
                    [int(prod[sampled].sum())], dtype=np.int64
                ),
            }
        )

    parts = kd.groupby("_g").map_groups(partial, batch_format="pandas")
    tot = parts.sum(["exact_part", "sample_part"])  # bounded 2-scalar reduce
    exact = int(tot["sum(exact_part)"] or 0)
    est = JS_MOD * int(tot["sum(sample_part)"] or 0)
    err = 10000 * abs(est - exact) // exact if exact else 0
    return pd.DataFrame(
        {
            "est_rows": pd.Series([est], dtype=np.int64),
            "exact_rows": pd.Series([exact], dtype=np.int64),
            "err_bp": pd.Series([err], dtype=np.int64),
        }
    )


JOIN_SIZE_ESTIMATE_SQL = f"""
WITH a AS (SELECT o_orderkey AS key, COUNT(*) AS n FROM orders GROUP BY 1),
b AS (SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1),
j AS (
  SELECT a.key, a.n * b.n AS prod,
    CASE WHEN CAST(concat('0x', substr(md5('js|' || CAST(a.key AS VARCHAR)), 1, 16)) AS UBIGINT)
         % {JS_MOD} = 0 THEN 1 ELSE 0 END AS sampled
  FROM a JOIN b USING (key)
), s AS (
  SELECT CAST(SUM(prod) AS BIGINT) AS exact_rows,
         CAST({JS_MOD} * SUM(prod * sampled) AS BIGINT) AS est_rows
  FROM j
)
SELECT est_rows, exact_rows,
  CAST(CASE WHEN exact_rows > 0
       THEN 10000 * abs(est_rows - exact_rows) // exact_rows
       ELSE 0 END AS BIGINT) AS err_bp
FROM s
"""


# ============================================== degree assortativity
#
# Degree-mixing coefficient of the link graph, integer-exact: Pearson r
# over (deg_src, deg_dst) across all directed edges of the symmetrized
# graph, emitted as the exact rational pieces (num, den_x, den_y) plus
# r² in milli-bp — hub-to-hub vs hub-to-leaf mixing, the structural
# signal separating link farms (assortative) from organic webs
# (disassortative). No square root ever computed.


def q_degree_assortativity(sf_dir: str):
    """One row: (n_edges, num, den_x, den_y, sign, r2_mbp) with
    num = n·Sxy − Sx·Sy etc. and r2_mbp = 10^6·num² // (den_x·den_y)
    (int64 is ample at this scale; a 10^10-edge run promotes the six
    sums to object dtype — they stay exact Python ints).

    Scale shape: edges bucket-resident by src (both directions stored,
    so degree is bucket-LOCAL); each bucket emits (node, deg) plus
    (dst-bucketed) half-edges carrying deg_src; ONE second exchange on
    the dst bucket attaches deg_dst from the co-resident degree rows;
    per-task six-sum partials -> bounded reduce."""
    import pyarrow.parquet as _pq

    from .queries import internal_edges_np

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    d = _read(sf_dir, "documents", columns=["doc_id"])
    empty = pd.DataFrame(
        {
            "n_edges": pd.Series([0], dtype=np.int64),
            "num": pd.Series([0], dtype=np.int64),
            "den_x": pd.Series([0], dtype=np.int64),
            "den_y": pd.Series([0], dtype=np.int64),
            "sign": pd.Series([0], dtype=np.int64),
            "r2_mbp": pd.Series([0], dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty

    def edges(t: pa.Table) -> pd.DataFrame:
        src, dst = internal_edges_np(
            t.column("doc_id").to_numpy(), n_docs, drop_self=True
        )
        e = pd.DataFrame(
            {
                "src": pd.Series(src, dtype=np.int64),
                "dst": pd.Series(dst, dtype=np.int64),
            }
        )
        e = pd.concat(
            [e, e.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
        ).drop_duplicates()
        e["b"] = e["src"] % _KCORE_NB
        return e

    def stage_a(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"])
        deg = g.groupby("src")["dst"].size()
        # half-edges routed to the dst bucket, carrying deg_src
        he = pd.DataFrame(
            {
                "kind": np.int64(0),
                "node": g["dst"].to_numpy(np.int64),
                "other": g["src"].to_numpy(np.int64),
                "deg": g["src"].map(deg).to_numpy(np.int64),
                "b2": g["dst"].to_numpy(np.int64) % _KCORE_NB,
            }
        )
        dd = pd.DataFrame(
            {
                "kind": np.int64(1),
                "node": deg.index.to_numpy(np.int64),
                "other": np.int64(-1),
                "deg": deg.to_numpy(np.int64),
                "b2": deg.index.to_numpy(np.int64) % _KCORE_NB,
            }
        )
        return pd.concat([he, dd], ignore_index=True)

    def stage_b(g: pd.DataFrame) -> pd.DataFrame:
        degs = dict(
            zip(g.loc[g["kind"] == 1, "node"], g.loc[g["kind"] == 1, "deg"])
        )
        he = g[g["kind"] == 0]
        dx = he["deg"].to_numpy(np.int64)
        dy = he["node"].map(degs).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": pd.Series([len(he)], dtype=np.int64),
                "sx": pd.Series([int(dx.sum())], dtype=np.int64),
                "sy": pd.Series([int(dy.sum())], dtype=np.int64),
                "sxx": pd.Series([int((dx * dx).sum())], dtype=np.int64),
                "syy": pd.Series([int((dy * dy).sum())], dtype=np.int64),
                "sxy": pd.Series([int((dx * dy).sum())], dtype=np.int64),
            }
        )

    parts = (
        d.map_batches(edges, batch_format="pyarrow")
        .groupby("b")
        .map_groups(stage_a, batch_format="pandas")
        .groupby("b2")
        .map_groups(stage_b, batch_format="pandas")
    )
    tot = parts.sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n = int(tot["sum(n)"] or 0)
    if n == 0:
        return empty
    sx, sy = int(tot["sum(sx)"]), int(tot["sum(sy)"])
    sxx, syy, sxy = int(tot["sum(sxx)"]), int(tot["sum(syy)"]), int(tot["sum(sxy)"])
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    r2 = 1_000_000 * num * num // (den_x * den_y) if den_x and den_y else 0
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n], dtype=np.int64),
            "num": pd.Series([num], dtype=np.int64),
            "den_x": pd.Series([den_x], dtype=np.int64),
            "den_y": pd.Series([den_y], dtype=np.int64),
            "sign": pd.Series([int(np.sign(num))], dtype=np.int64),
            "r2_mbp": pd.Series([r2], dtype=np.int64),
        }
    )


DEGREE_ASSORTATIVITY_SQL = """
WITH n0 AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (
  SELECT doc_id,
    CAST(1 + CAST(concat('0x', substr(md5('lnkk:42:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % 4 AS BIGINT) AS k
  FROM documents
),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n0
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id
),
e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
x AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(da.d) AS HUGEINT) AS sx, CAST(SUM(db.d) AS HUGEINT) AS sy,
         CAST(SUM(da.d * da.d) AS HUGEINT) AS sxx,
         CAST(SUM(db.d * db.d) AS HUGEINT) AS syy,
         CAST(SUM(da.d * db.d) AS HUGEINT) AS sxy
  FROM e JOIN deg da ON da.node = e.src JOIN deg db ON db.node = e.dst
)
SELECT CAST(n AS BIGINT) AS n_edges,
  CAST(n * sxy - sx * sy AS BIGINT) AS num,
  CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
  CAST(n * syy - sy * sy AS BIGINT) AS den_y,
  CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
            WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT) AS sign,
  CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
       THEN 1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy)
            // ((n * sxx - sx * sx) * (n * syy - sy * sy))
       ELSE 0 END AS BIGINT) AS r2_mbp
FROM x
"""


# ============================================ content-defined chunking
#
# CDC (rsync/borg/restic-style, public technique): chunk boundaries
# fall where a rolling window's hash hits a divisor condition, so an
# insertion early in a document only re-chunks ONE chunk — the property
# that makes storage-level dedup of near-identical crawls cheap. Window
# hash = md5 of the last CDC_W chars (the md5 hash family standing in
# for a gear/Rabin hash; boundary semantics identical).

CDC_W = 8
CDC_DIV = 64  # expected chunk size ~ CDC_DIV chars


def cdc_boundaries(text: str) -> list[int]:
    """0-based positions i (i >= CDC_W-1) where the window
    text[i-CDC_W+1 : i+1] hashes to 0 mod CDC_DIV — each is the
    INCLUSIVE end of a chunk."""
    out = []
    for i in range(CDC_W - 1, len(text)):
        w = text[i - CDC_W + 1 : i + 1]
        h = int(hashlib.md5(("cdc|" + w).encode("utf-8")).hexdigest()[:16], 16)
        if h % CDC_DIV == 0:
            out.append(i)
    return out


def q_cdc_chunks(sf_dir: str):
    """(doc_id, n_chunks, max_chunk, bounds_md5): chunk count, largest
    chunk length, and md5 of the comma-joined boundary list (pins every
    boundary position exactly).

    Scale shape: pure per-batch map — chunking is embarrassingly
    parallel; the downstream chunk-hash dedup is the dedup_exact
    exchange already demonstrated."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nc, mx, bm = [], [], []
        for t in df["text"].tolist():
            bs = cdc_boundaries(t)
            ends = bs + ([len(t) - 1] if (not bs or bs[-1] != len(t) - 1) else [])
            lens = [ends[0] + 1] + [
                ends[i] - ends[i - 1] for i in range(1, len(ends))
            ]
            nc.append(len(ends) if len(t) else 0)
            mx.append(max(lens) if len(t) else 0)
            bm.append(
                hashlib.md5(",".join(str(b) for b in bs).encode("utf-8")).hexdigest()
            )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_chunks": pd.Series(nc, dtype=np.int64),
                "max_chunk": pd.Series(mx, dtype=np.int64),
                "bounds_md5": pd.Series(bm, dtype=object),
            }
        )

    return d.map_batches(chunk, batch_format="pandas")


CDC_CHUNKS_SQL = f"""
WITH pos AS (
  -- length() = characters (matches Python indexing); strlen is BYTES
  SELECT doc_id, length(text) AS n, i
  FROM documents, unnest(range({CDC_W - 1}, length(text))) t(i)
  WHERE CAST(concat('0x', substr(md5('cdc|' ||
          substr(text, CAST(i AS INTEGER) - {CDC_W - 2}, {CDC_W})), 1, 16))
        AS UBIGINT) % {CDC_DIV} = 0
), b AS (
  SELECT doc_id, ANY_VALUE(n) AS n,
         list_sort(list(i)) AS bs,
         md5(string_agg(CAST(i AS VARCHAR), ',' ORDER BY i)) AS bounds_md5
  FROM pos GROUP BY doc_id
), withend AS (
  SELECT doc_id, n, bounds_md5,
    CASE WHEN len(bs) = 0 OR bs[-1] <> n - 1
         THEN list_append(bs, n - 1) ELSE bs END AS ends
  FROM b
), lens AS (
  SELECT doc_id, n, bounds_md5, ends,
    list_transform(range(1, len(ends) + 1),
      j -> CASE WHEN j = 1 THEN ends[1] + 1
                ELSE ends[j] - ends[j - 1] END) AS chunk_lens
  FROM withend
)
SELECT d.doc_id AS doc_id,
  CAST(COALESCE(len(l.ends),
       CASE WHEN length(d.text) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks,
  CAST(COALESCE(list_max(l.chunk_lens),
       length(d.text)) AS BIGINT) AS max_chunk,
  COALESCE(l.bounds_md5, md5('')) AS bounds_md5
FROM documents d LEFT JOIN lens l USING (doc_id)
"""


# ===================================================== LRU hit rate
#
# Cache / working-set analysis via the stack-distance equivalence: an
# LRU cache of capacity C hits an access iff FEWER than C distinct
# items were touched since that item's previous access — so per-key
# cache simulation distributes perfectly (each user's stream folds
# independently) and the SQL oracle needs no mutable cache state, only
# a distinct-count between consecutive accesses. The measurement a
# crawl re-fetch cache (or a politeness DNS cache) is sized from.

LRU_CAPACITY = 4


def lru_hits(items: list) -> int:
    """Exact LRU(C) hit count over one access stream (MRU-list sim)."""
    cache: list = []
    hits = 0
    for x in items:
        if x in cache:
            hits += 1
            cache.remove(x)
        elif len(cache) == LRU_CAPACITY:
            cache.pop()  # evict LRU (list is MRU-first)
        cache.insert(0, x)
    return hits


def q_lru_hit_rate(sf_dir: str):
    """(user_id, n_accesses, n_hits, hit_bp): LRU(4) hit statistics of
    each user's event_type access stream ordered by (ts, event_id).

    Scale shape: ONE coarse exchange on user_id; the fold is per-user
    local. The stack-distance identity keeps the oracle declarative."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    kd = _with_coarse_group(ev, "user_id")

    def sim(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_n, out_h = [], [], []
        for uid, rows in g.groupby("user_id"):
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            h = lru_hits(rows["event_type"].tolist())
            out_u.append(uid)
            out_n.append(len(rows))
            out_h.append(h)
        n = np.array(out_n, dtype=np.int64)
        h = np.array(out_h, dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_u, dtype=np.int64),
                "n_accesses": n,
                "n_hits": h,
                "hit_bp": 10000 * h // np.maximum(n, 1),
            }
        )

    return kd.groupby("_g").map_groups(sim, batch_format="pandas")


LRU_HIT_RATE_SQL = f"""
WITH s AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, event_type, rn,
         LAG(rn) OVER (PARTITION BY user_id, event_type ORDER BY rn) AS prev
  FROM s
), h AS (
  SELECT user_id, rn,
    CASE WHEN prev IS NOT NULL AND (
      SELECT COUNT(DISTINCT s2.event_type) FROM s s2
      WHERE s2.user_id = p.user_id AND s2.rn > p.prev AND s2.rn < p.rn
    ) < {LRU_CAPACITY} THEN 1 ELSE 0 END AS hit
  FROM p
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_accesses,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       CAST(10000 * SUM(hit) // GREATEST(COUNT(*), 1) AS BIGINT) AS hit_bp
FROM h GROUP BY user_id
"""


# ========================================================= BM25 ranking
#
# BM25-lite top-k for a fixed query, integer-exact: the log in IDF is
# replaced by its odds ratio (N - df + ½)/(df + ½) — order-preserving
# for ranking — and k1=6/5, b=3/4 as exact fractions, so every doc's
# score is a RATIONAL whose milli-bp floor both engines compute
# identically. Completes the IR family (tf-idf top terms, inverted
# index) with query-time ranking.

BM25_QUERY = ["merge", "window"]
BM25_TOPK = 10
# k1 = 6/5, b = 3/4; doubled-to-integer forms below avoid any fraction


def q_bm25_rank(sf_dir: str):
    """(rank, doc_id, score_mbp): top-10 docs for the fixed two-term
    query; score_mbp = floor(10^6 * Σ_t idf_t · tf_t·(k1+1) /
    (tf_t + k1·(1 − b + b·len/avglen))) computed in exact integer
    arithmetic (see the common-denominator expansion in the SQL).

    Scale shape: per-batch (doc, tf_t, len) combiner for the two query
    terms only (projection pushdown at the tokenizer); corpus constants
    (N, df_t, Σlen) are a bounded reduce broadcast into the scoring
    map; final top-k is sort+limit on the scored narrow table."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        toks = [t.split(" ") if t else [] for t in df["text"].tolist()]
        lens = np.array([len(ts) for ts in toks], dtype=np.int64)
        out = {"doc_id": ids, "dl": lens, "one": np.ones(len(ids), np.int64)}
        for i, q in enumerate(BM25_QUERY):
            tf = np.array([ts.count(q) for ts in toks], dtype=np.int64)
            out[f"tf{i}"] = tf
            out[f"gt{i}"] = (tf > 0).astype(np.int64)
        return pd.DataFrame(out)

    scored_input = d.map_batches(stats, batch_format="pandas").materialize()
    # ALL corpus constants (N, Σdl, per-term dfs) from ONE reduce pass —
    # indicator columns ride the combiner (review finding: the old
    # per-term filter().count() cost two extra full scans)
    cols = (
        ["dl", "one"]
        + [f"tf{i}" for i in range(len(BM25_QUERY))]
        + [f"gt{i}" for i in range(len(BM25_QUERY))]
    )
    tot = scored_input.sum(cols)
    n_docs_total = int(tot["sum(one)"] or 0)
    sum_dl = int(tot["sum(dl)"] or 0)
    dfs = [int(tot[f"sum(gt{i})"] or 0) for i in range(len(BM25_QUERY))]
    const_ref = ray.put((n_docs_total, sum_dl, dfs))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        n_total, sdl, dfs_ = ray.get(const_ref)
        if n_total == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "score_mbp": pd.Series([], dtype=np.int64),
                }
            )
        dl = df["dl"].to_numpy(np.int64)
        # exact rational sum per doc: idf = (2N-2df+1)/(2df+1) (halves
        # doubled away); tf term with k1=6/5, b=3/4 over the common
        # denominator 20·sdl: num = 44·tf·sdl,
        # den = 20·tf·sdl + 6·sdl + 18·dl·N
        from fractions import Fraction

        fr = [Fraction(0) for _ in range(len(df))]
        for i in range(len(BM25_QUERY)):
            tf = df[f"tf{i}"].to_numpy(np.int64)
            idf = Fraction(2 * n_total - 2 * dfs_[i] + 1, 2 * dfs_[i] + 1)
            for j in range(len(df)):
                num = 44 * int(tf[j]) * sdl
                den = 20 * int(tf[j]) * sdl + 6 * sdl + 18 * int(dl[j]) * n_total
                fr[j] += idf * Fraction(num, den)
        mbp = np.array(
            [int(f * 1_000_000) for f in fr], dtype=np.int64
        )  # Fraction.__mul__ then int() floors toward zero; scores >= 0
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "score_mbp": mbp}
        )

    scored = scored_input.map_batches(score, batch_format="pandas")
    top = (
        scored.sort(["score_mbp", "doc_id"], descending=[True, False])
        .limit(BM25_TOPK)
        .to_pandas()
    )
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def _bm25_sql() -> str:
    # per-term exact fraction: idf_num/idf_den * num/den, summed over
    # the two terms with the common denominator, floored at 10^6
    terms = []
    for i, q in enumerate(BM25_QUERY):
        terms.append(
            f"""
t{i} AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w = '{q}')) AS HUGEINT) AS tf
  FROM documents
), df{i} AS (SELECT CAST(COUNT(*) AS HUGEINT) AS df FROM t{i} WHERE tf > 0)"""
        )
    return f"""
WITH consts AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(len(string_split(text, ' '))) AS HUGEINT) AS sdl
  FROM documents
),{",".join(terms)},
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS HUGEINT) AS dl
  FROM documents
),
scored AS (
  SELECT dl.doc_id,
    -- exact rational sum floored at 10^6: (a1/b1 + a2/b2) -> (a1·b2 + a2·b1)/(b1·b2)
    CAST(1000000 * (
        (2*c.n - 2*f0.df + 1) * (44 * t0.tf * c.sdl)
          * ((2*f1.df + 1) * (20 * t1.tf * c.sdl + 6 * c.sdl + 18 * dl.dl * c.n))
      + (2*c.n - 2*f1.df + 1) * (44 * t1.tf * c.sdl)
          * ((2*f0.df + 1) * (20 * t0.tf * c.sdl + 6 * c.sdl + 18 * dl.dl * c.n))
    ) // (
        ((2*f0.df + 1) * (20 * t0.tf * c.sdl + 6 * c.sdl + 18 * dl.dl * c.n))
      * ((2*f1.df + 1) * (20 * t1.tf * c.sdl + 6 * c.sdl + 18 * dl.dl * c.n))
    ) AS BIGINT) AS score_mbp
  FROM dl
  JOIN t0 ON t0.doc_id = dl.doc_id
  JOIN t1 ON t1.doc_id = dl.doc_id,
  consts c, df0 f0, df1 f1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_mbp DESC, doc_id ASC) AS BIGINT)
         AS rank,
       doc_id, score_mbp
FROM scored
ORDER BY score_mbp DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


# ====================================================== late-data audit
#
# Event-time vs processing-time accounting (the Flink/Beam windowing
# concept): each event's ARRIVAL is its event time plus a deterministic
# network delay; a 10-minute tumbling event-time window with 5 minutes
# of allowed lateness DROPS (marks late) every event arriving after
# window_end + 5min — the number that sizes a streaming pipeline's
# lateness allowance before data loss.

LATE_WIN_US = 10 * 60 * 1_000_000
LATE_ALLOW_US = 5 * 60 * 1_000_000
LATE_MAX_DELAY_US = 10 * 60 * 1_000_000


def q_late_data(sf_dir: str):
    """(win, n_events, n_late, late_bp): per event-time window, events
    whose simulated arrival misses the watermark allowance.

    Scale shape: pure per-batch classification + (win) combiner -> one
    bounded-by-time-range groupby (windows, not events, are the key
    domain)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("int64").to_numpy()
        eid = df["event_id"].to_numpy(np.int64)
        delay = np.array(
            [
                int(hashlib.md5(f"lat|{int(i)}".encode("utf-8")).hexdigest()[:16], 16)
                % LATE_MAX_DELAY_US
                for i in eid
            ],
            dtype=np.int64,
        )
        win = t // LATE_WIN_US
        win_end = (win + 1) * LATE_WIN_US
        late = (t + delay > win_end + LATE_ALLOW_US).astype(np.int64)
        out = pd.DataFrame({"win": win, "n": np.int64(1), "late": late})
        g = out.groupby("win", as_index=False).sum()
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("win", as_index=False)[["n", "late"]].sum()
        n = m["n"].to_numpy(np.int64)
        late = m["late"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "win": m["win"].to_numpy(np.int64),
                "n_events": n,
                "n_late": late,
                "late_bp": 10000 * late // np.maximum(n, 1),
            }
        )

    # one Ray group per day of windows keeps group count bounded
    kd = ev.map_batches(classify, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["wb"] = df["win"] % 16
        return df

    return (
        kd.map_batches(bucket, batch_format="pandas")
        .groupby("wb")
        .map_groups(lambda g: merge(g.drop(columns=["wb"])), batch_format="pandas")
    )


LATE_DATA_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS t,
    CAST(concat('0x', substr(md5('lat|' || CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT)
      % {LATE_MAX_DELAY_US} AS delay
  FROM events
), c AS (
  SELECT t // {LATE_WIN_US} AS win,
    CASE WHEN t + delay > (t // {LATE_WIN_US} + 1) * {LATE_WIN_US}
              + {LATE_ALLOW_US} THEN 1 ELSE 0 END AS late
  FROM e
)
SELECT CAST(win AS BIGINT) AS win,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(late) AS BIGINT) AS n_late,
  CAST(10000 * SUM(late) // GREATEST(COUNT(*), 1) AS BIGINT) AS late_bp
FROM c GROUP BY win
"""


# =================================================== product quantization
#
# PQ codes (Jégou et al., TPAMI 2011 — public; the IVF-PQ memory story):
# the 64-dim embedding splits into 8 subspaces of 8 dims; each subspace
# quantizes to one of 16 codewords, so a vector compresses 64 floats ->
# 8 nibbles (64x). Codewords are the subvectors of the 16 md5-smallest
# vec_ids (the deterministic-sample trick that made ann_ivf oracle-able);
# assignment is argmin squared L2 with index tie-break (float ties are
# measure-zero, as acknowledged for the other ANN oracles).

PQ_SUBSPACES = 8
PQ_SUBDIM = 8
PQ_CODEWORDS = 16


def _sq_l2_expansion(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise squared L2 as ``a·a − 2 a·b + b·b`` — the SAME
    inner-product expansion the DuckDB oracles evaluate
    (``list_inner_product(a,a) - 2*list_inner_product(a,b) +
    list_inner_product(b,b)``), so near-equal distances are computed
    from the same formula on both engines and don't rank-flip across
    them (ADVICE r3: the direct ``sum((a-b)**2)`` form is not
    IEEE-identical to the expansion). Returns shape (len(a), len(b))."""
    aa = np.einsum("ij,ij->i", a, a)
    bb = np.einsum("ij,ij->i", b, b)
    return aa[:, None] - 2.0 * (a @ b.T) + bb[None, :]


def _pq_codebook(emb: ray.data.Dataset) -> np.ndarray | None:
    """(16, 64) codebook: the subvector source rows are the PQ_CODEWORDS
    vectors with the smallest md5(vec_id) — shuffle-free per-batch prune,
    ONE distributed combine, then an O(PQ_CODEWORDS) driver reduce
    (independent of block count — VERDICT r3 #2); None on an empty
    table. The ONE codebook rule shared by product_quantize and
    pq_recall (review finding: the selection block was duplicated)."""
    import hashlib as _hl

    from .grouping import global_prune

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        md5s = np.array(
            [_hl.md5(str(int(v)).encode()).hexdigest() for v in df["vec_id"]]
        )
        keep = np.argsort(md5s)[:PQ_CODEWORDS]
        return df.iloc[np.sort(keep)][["vec_id", "embedding"]]

    cands = global_prune(emb, cand, batch_format="pandas")
    if cands.empty:  # Ray's empty to_pandas() carries no columns
        return None
    md5s = np.array(
        [_hl.md5(str(int(v)).encode()).hexdigest() for v in cands["vec_id"]]
    )
    order = np.argsort(md5s)[:PQ_CODEWORDS]
    # row index IS the codeword id (= md5 rank, as in the SQL ROW_NUMBER)
    return np.stack(cands.iloc[order]["embedding"].to_numpy()).astype(np.float64)


def q_product_quantize(sf_dir: str):
    """(vec_id, code): the 8-nibble PQ code as 'c0-c1-...-c7'.

    Scale shape: codebook selection is the shuffle-free per-batch md5
    prune + bounded driver reduce (16 rows); the codebook broadcasts
    once; encoding is one vectorized (batch x 16 x 8) distance pass per
    subspace."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codebook = _pq_codebook(emb)
    if codebook is None:
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype=np.int64),
                "code": pd.Series([], dtype=object),
            }
        )
    cb_ref = ray.put(codebook)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        cb = ray.get(cb_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes = []
        for s in range(PQ_SUBSPACES):
            sl = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
            d2 = _sq_l2_expansion(mat[:, sl], cb[:, sl])
            codes.append(np.argmin(d2, axis=1))  # first min = smallest idx
        code_str = ["-".join(str(int(c[j])) for c in codes) for j in range(len(df))]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "code": pd.Series(code_str, dtype=object),
            }
        )

    return emb.map_batches(encode, batch_format="pandas")


PRODUCT_QUANTIZE_SQL = f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
  FROM d ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_CODEWORDS}
),
sub AS (SELECT unnest(range({PQ_SUBSPACES})) AS s),
assign AS (
  SELECT vec_id, s, cid FROM (
    SELECT d.vec_id, sub.s, c.cid,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id, sub.s ORDER BY
        list_inner_product(
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        - 2 * list_inner_product(
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        + list_inner_product(
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        ASC, c.cid ASC) AS rn
    FROM d CROSS JOIN sub CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT vec_id,
       string_agg(CAST(cid AS VARCHAR), '-' ORDER BY s) AS code
FROM assign GROUP BY vec_id
"""


# =================================================== compression ratio
#
# The Gopher/FineWeb compression-quality signal: highly repetitive or
# templated text compresses far below the corpus norm; zlib level 6 is
# deterministic for a given input, so the per-doc ratio is a stable
# filter feature. ROWS-ONLY gate entry: DuckDB has no zlib, so the
# oracle cannot recompute the compressed byte count (the driver checks
# rows + schema; the semantics are pinned by the unit test instead).


def q_compression_ratio(sf_dir: str):
    """(doc_id, raw_len, zlib_len, ratio_bp): deflate-compressed size in
    basis points of the raw UTF-8 size (lower = more repetitive).

    Scale shape: pure per-batch map; zlib state never leaves the task."""
    import zlib as _zlib

    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def comp(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        raw = [t.encode("utf-8") for t in df["text"].tolist()]
        zl = np.array(
            [len(_zlib.compress(b, 6)) for b in raw], dtype=np.int64
        )
        rl = np.array([len(b) for b in raw], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "raw_len": rl,
                "zlib_len": zl,
                "ratio_bp": 10000 * zl // np.maximum(rl, 1),
            }
        )

    return d.map_batches(comp, batch_format="pandas")


# ======================================================== KMV error
#
# Sketch-accuracy evaluation #2 (the minhash_error philosophy applied
# to distinct counting): the KMV estimator (K−1)·2^64 / h_K next to the
# exact distinct count per language, in exact integer arithmetic on both
# engines — measures the sketch before a 100 TB run trusts it for
# capacity planning.

KMV_K = 64
_KMV_2_64 = 1 << 64


def q_kmv_error(sf_dir: str):
    """(lang, n_exact, est, err_bp): integer KMV estimate (exact count
    when the sketch is unsaturated, n < K) vs the exact distinct-token
    count.

    Scale shape: entirely the existing distinct_tokens_kmv operator (its
    exchange moves hashes, never tokens) plus a 5-row map."""
    from .queries import q_distinct_tokens_kmv

    base = q_distinct_tokens_kmv(sf_dir, k=KMV_K)
    df = base.to_pandas() if hasattr(base, "to_pandas") and not isinstance(
        base, pd.DataFrame
    ) else base
    if df.empty:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "n_exact": pd.Series([], dtype=np.int64),
                "est": pd.Series([], dtype=np.int64),
                "err_bp": pd.Series([], dtype=np.int64),
            }
        )
    n = df["n_distinct_exact"].to_numpy(np.int64)
    ests = []
    for nx, hk in zip(n, df["kmv_hk"].to_numpy(np.int64)):
        if nx < KMV_K:
            ests.append(int(nx))
        else:
            h_u = int(hk) + (_KMV_2_64 if hk < 0 else 0)
            ests.append((KMV_K - 1) * _KMV_2_64 // h_u)
    est = np.array(ests, dtype=np.int64)
    return pd.DataFrame(
        {
            "lang": df["lang"].to_numpy(),
            "n_exact": n,
            "est": est,
            "err_bp": 10000 * np.abs(est - n) // np.maximum(n, 1),
        }
    )


def _kmv_error_sql() -> str:
    from .queries import DISTINCT_TOKENS_KMV_SQL

    return f"""
WITH base AS ({DISTINCT_TOKENS_KMV_SQL}),
u AS (
  SELECT lang, n_distinct_exact AS n_exact,
    CAST(kmv_hk AS HUGEINT)
      + CASE WHEN kmv_hk < 0 THEN CAST({_KMV_2_64} AS HUGEINT) ELSE 0 END AS h_u
  FROM base
), e AS (
  SELECT lang, n_exact,
    CAST(CASE WHEN n_exact < {KMV_K} THEN n_exact
         ELSE ({KMV_K - 1} * CAST({_KMV_2_64} AS HUGEINT)) // h_u
         END AS BIGINT) AS est
  FROM u
)
SELECT lang, n_exact, est,
  CAST(10000 * abs(est - n_exact) // GREATEST(n_exact, 1) AS BIGINT) AS err_bp
FROM e
"""


# ========================================================== PQ recall
#
# The measurement that justifies PQ compression: asymmetric-distance
# (ADC) top-k — query subvectors against the 8-nibble codes — versus the
# exact L2 top-k, reported as recall@10 per query. Float distance ties
# are measure-zero (the standing ANN-oracle caveat); every rank is
# tie-broken by vec_id on both engines.

PQ_RECALL_K = 10
PQ_RECALL_QUERIES = 5


def q_pq_recall(sf_dir: str):
    """(query_id, n_match, recall_bp): |ADC top-10 ∩ exact top-10| per
    query (query vectors are vec_id < 5; self excluded on both sides).

    Scale shape: codebook + the 5 query vectors broadcast once;
    per-batch ADC and exact distances -> per-batch top-k candidates ->
    bounded (queries x k x blocks) final reduce."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "n_match": pd.Series([], dtype=np.int64),
            "recall_bp": pd.Series([], dtype=np.int64),
        }
    )
    codebook = _pq_codebook(emb)
    if codebook is None:
        return empty
    qdf = (
        emb.filter(lambda r: r["vec_id"] < PQ_RECALL_QUERIES)
        .to_pandas()
        .sort_values("vec_id")
    )
    if qdf.empty:
        return empty
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    bc = ray.put((codebook, qmat, qids))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        cb, qm, qi = ray.get(bc)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vids = df["vec_id"].to_numpy(np.int64)
        rows = []
        # exact squared L2 via the oracle's inner-product expansion
        ex = _sq_l2_expansion(qm, mat)
        # ADC: per subspace, assign the codeword (expansion + first-min =
        # cid ASC tie-break) and add the query→codeword distance — the
        # same per-subspace SUM the SQL's `adc` CTE evaluates
        adc = np.zeros((len(qm), len(mat)))
        for s in range(PQ_SUBSPACES):
            sl = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
            codes_s = np.argmin(_sq_l2_expansion(mat[:, sl], cb[:, sl]), axis=1)
            qd = _sq_l2_expansion(qm[:, sl], cb[:, sl])  # (nq, 16)
            adc += qd[:, codes_s]
        for qx in range(len(qi)):
            mask = vids != qi[qx]  # self excluded
            for kind, dist in (("exact", ex[qx]), ("adc", adc[qx])):
                d = dist[mask]
                v = vids[mask]
                o = np.lexsort((v, d))[: PQ_RECALL_K]
                for j in o:
                    rows.append((int(qi[qx]), kind, float(d[j]), int(v[j])))
        return pd.DataFrame(rows, columns=["query_id", "kind", "dist", "vec_id"])

    parts = emb.map_batches(local_topk, batch_format="pandas").to_pandas()
    # bounded: queries x 2 x k x n_blocks rows
    out_q, out_m = [], []
    for qid in sorted(parts["query_id"].unique()):
        sub = parts[parts["query_id"] == qid]
        tops = {}
        for kind in ("exact", "adc"):
            s = sub[sub["kind"] == kind].sort_values(
                ["dist", "vec_id"], kind="mergesort"
            )
            tops[kind] = set(s["vec_id"].head(PQ_RECALL_K))
        out_q.append(int(qid))
        out_m.append(len(tops["exact"] & tops["adc"]))
    m = np.array(out_m, dtype=np.int64)
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype=np.int64),
            "n_match": m,
            "recall_bp": 10000 * m // PQ_RECALL_K,
        }
    )


def _pq_recall_sql() -> str:
    sub_expr = (
        lambda col: f"{col}[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)]"
    )
    d_e, c_e, q_e = sub_expr("d.e"), sub_expr("c.e"), sub_expr("q.e")
    return f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
  FROM d ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_CODEWORDS}
),
sub AS (SELECT unnest(range({PQ_SUBSPACES})) AS s),
assign AS (
  SELECT vec_id, s, cid FROM (
    SELECT d.vec_id, sub.s, c.cid,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id, sub.s ORDER BY
        list_inner_product({d_e}, {d_e})
        - 2 * list_inner_product({d_e}, {c_e})
        + list_inner_product({c_e}, {c_e}) ASC, c.cid ASC) AS rn
    FROM d CROSS JOIN sub CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, e FROM d WHERE vec_id < {PQ_RECALL_QUERIES}),
adc AS (
  SELECT q.query_id, a.vec_id, SUM(
      list_inner_product({q_e}, {q_e})
      - 2 * list_inner_product({q_e}, {c_e})
      + list_inner_product({c_e}, {c_e})) AS dist
  FROM q CROSS JOIN sub
  JOIN assign a ON a.s = sub.s
  JOIN cent c ON c.cid = a.cid
  WHERE a.vec_id <> q.query_id
  GROUP BY 1, 2
),
adc_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
    FROM adc) WHERE rn <= {PQ_RECALL_K}
),
exact_top AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, d.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_inner_product(q.e, q.e) - 2 * list_inner_product(q.e, d.e)
        + list_inner_product(d.e, d.e) ASC, d.vec_id ASC) AS rn
    FROM q JOIN d ON d.vec_id <> q.query_id) WHERE rn <= {PQ_RECALL_K}
)
SELECT e.query_id AS query_id,
  CAST(COUNT(a.vec_id) AS BIGINT) AS n_match,
  CAST(10000 * COUNT(a.vec_id) // {PQ_RECALL_K} AS BIGINT) AS recall_bp
FROM exact_top e
LEFT JOIN adc_top a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY 1
"""


# ====================================================== path templates
#
# URL template mining: generalize paths by collapsing digit runs (and
# 32-hex tokens) to placeholders and count pages per template — the
# taxonomy a crawl scheduler budgets by ("/product/{N} is 80% of the
# site"). The Ray side PARSES and generalizes real URLs; the oracle
# derives the expected template per generation family, so a templating
# slip (digit run missed, hex not collapsed, query not stripped) breaks
# the gate.


def url_template(url: str) -> str:
    import re as _re

    rest = url.split("://", 1)[1]
    path = rest.partition("?")[0].partition("/")[2]
    t = "/" + path
    t = _re.sub(r"[0-9a-f]{32}", "{H}", t)
    t = _re.sub(r"[0-9]+", "{N}", t)
    return t


def q_path_templates(sf_dir: str):
    """(template, n_urls): page counts per generalized path template
    over the crawl-trap URL corpus.

    Scale shape: per-batch template map + count combiner -> bounded
    groupby (templates are a rule-bounded domain — the whole point of
    templating)."""
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def tpl(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        ts = [url_template(_trap_url(int(i))) for i in ids]
        out = pd.DataFrame({"template": ts}).groupby(
            "template", as_index=False
        ).size()
        out.columns = ["template", "n"]
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("template", as_index=False)["n"].sum()
        out.columns = ["template", "n_urls"]
        return out.astype({"n_urls": np.int64})

    return (
        d.map_batches(tpl, batch_format="pandas")
        .groupby("template")
        .map_groups(merge, batch_format="pandas")
    )


def _path_templates_sql() -> str:
    fam1 = "".join("/s{N}x{N}" for _ in range(12))
    return f"""
WITH t AS (
  SELECT CASE doc_id % 5
    WHEN 0 THEN '/a/{{H}}/c{{N}}'
    WHEN 1 THEN '{fam1}'
    WHEN 2 THEN '/cat/x/x/x/page{{N}}'
    WHEN 3 THEN '/{{N}}/{{N}}/{{N}}/{{N}}/{{N}}/{{N}}/post{{N}}'
    ELSE '/page{{N}}' END AS template
  FROM documents
)
SELECT template, CAST(COUNT(*) AS BIGINT) AS n_urls FROM t GROUP BY template
"""


# ==================================================== top-decile share
#
# Activity concentration: what share of all events comes from the top
# 10% most active users — computed WITHOUT ranking any user. The
# count-of-counts histogram (bounded by the activity domain) yields the
# decile threshold T, and every tied user at T contributes exactly T
# events, so the tie tail is (k - above)·T with no per-user selection —
# the count_gini/waterfill trick applied to decile concentration.


def q_top_decile_share(sf_dir: str):
    """One row: (n_users, k, events_top, events_total, share_bp) with
    k = ceil(n/10) top users by activity (ties resolved by count alone —
    every tied user contributes the same T events, so no per-user
    tie-break is ever needed).

    Scale shape: per-batch (user, n) combiner -> ONE coarse exchange ->
    per-task count-of-counts partials (bounded by the activity domain)
    -> driver threshold solve over the small histogram."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).size()
        out.columns = ["user_id", "n"]
        return out.astype(np.int64)

    kd = _with_coarse_group(
        ev.map_batches(partial, batch_format="pandas"), "user_id"
    )

    def coc(g: pd.DataFrame) -> pd.DataFrame:
        x = g.groupby("user_id")["n"].sum()
        out = x.value_counts().rename_axis("cnt").reset_index(name="n_users")
        return out.astype(np.int64)

    h = (
        kd.groupby("_g")
        .map_groups(coc, batch_format="pandas")
        .groupby("cnt")
        .map_groups(
            lambda g: g.groupby("cnt", as_index=False)["n_users"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )  # bounded: one row per distinct activity level
    if h.empty:
        return pd.DataFrame(
            {
                "n_users": pd.Series([0], dtype=np.int64),
                "k": pd.Series([0], dtype=np.int64),
                "events_top": pd.Series([0], dtype=np.int64),
                "events_total": pd.Series([0], dtype=np.int64),
                "share_bp": pd.Series([0], dtype=np.int64),
            }
        )
    h = h.sort_values("cnt", ascending=False)
    cnts = h["cnt"].to_numpy(np.int64)
    nus = h["n_users"].to_numpy(np.int64)
    n_users = int(nus.sum())
    total = int((cnts * nus).sum())
    k = (n_users + 9) // 10
    cum_users = np.cumsum(nus)
    i = int(np.searchsorted(cum_users, k, side="left"))  # threshold level
    above = int(cum_users[i - 1]) if i > 0 else 0
    top = int((cnts[:i] * nus[:i]).sum()) + (k - above) * int(cnts[i])
    return pd.DataFrame(
        {
            "n_users": pd.Series([n_users], dtype=np.int64),
            "k": pd.Series([k], dtype=np.int64),
            "events_top": pd.Series([top], dtype=np.int64),
            "events_total": pd.Series([total], dtype=np.int64),
            "share_bp": pd.Series(
                [10000 * top // total if total else 0], dtype=np.int64
            ),
        }
    )


TOP_DECILE_SHARE_SQL = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rn FROM c
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST((COUNT(*) + 9) // 10 AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS events_total
  FROM c
)
SELECT t.n_users, t.k,
  CAST((SELECT SUM(n) FROM r, t WHERE r.rn <= t.k) AS BIGINT) AS events_top,
  t.events_total,
  CAST(CASE WHEN t.events_total > 0
       THEN 10000 * (SELECT SUM(n) FROM r, t WHERE r.rn <= t.k)
            // t.events_total ELSE 0 END AS BIGINT) AS share_bp
FROM t
"""


# ====================================================== fairness index
#
# Jain's fairness index over per-entity load, integer-exact: J =
# (Σx)² / (n·Σx²) ∈ (0, 1], 1 = perfectly even — the standard scheduler
# fairness number (here: how evenly the event load spreads across
# users; in production, how evenly a politeness scheduler spreads
# fetches across hosts). Complements count_gini (inequality) with the
# fairness formulation, no sort and no histogram needed — just three
# integer sums.


def q_fairness_index(sf_dir: str):
    """One row: (n_users, sum_x, sum_x2, fairness_bp) with fairness_bp =
    10000·(Σx)² // (n·Σx²).

    Scale shape: per-batch (user, count) combiner -> ONE coarse exchange
    on user_id -> per-task (n, Σx, Σx²) partials -> 3-scalar reduce."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).size()
        out.columns = ["user_id", "n"]
        return out.astype(np.int64)

    kd = _with_coarse_group(
        ev.map_batches(partial, batch_format="pandas"), "user_id"
    )

    def sums(g: pd.DataFrame) -> pd.DataFrame:
        x = g.groupby("user_id")["n"].sum().to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_users": pd.Series([len(x)], dtype=np.int64),
                "sum_x": pd.Series([int(x.sum())], dtype=np.int64),
                "sum_x2": pd.Series([int((x * x).sum())], dtype=np.int64),
            }
        )

    parts = kd.groupby("_g").map_groups(sums, batch_format="pandas")
    tot = parts.sum(["n_users", "sum_x", "sum_x2"])
    n = int(tot["sum(n_users)"] or 0)
    sx = int(tot["sum(sum_x)"] or 0)
    sx2 = int(tot["sum(sum_x2)"] or 0)
    fb = 10000 * sx * sx // (n * sx2) if n and sx2 else 0
    return pd.DataFrame(
        {
            "n_users": pd.Series([n], dtype=np.int64),
            "sum_x": pd.Series([sx], dtype=np.int64),
            "sum_x2": pd.Series([sx2], dtype=np.int64),
            "fairness_bp": pd.Series([fb], dtype=np.int64),
        }
    )


FAIRNESS_INDEX_SQL = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(x * x) AS BIGINT) AS sum_x2
  FROM c
)
SELECT n_users, sum_x, sum_x2,
  -- HUGEINT: 10^4 · (Σx)² overflows BIGINT past ~3e7 events (review)
  CAST(CASE WHEN n_users > 0 AND sum_x2 > 0
       THEN (10000 * CAST(sum_x AS HUGEINT) * CAST(sum_x AS HUGEINT))
            // (CAST(n_users AS HUGEINT) * CAST(sum_x2 AS HUGEINT))
       ELSE 0 END AS BIGINT) AS fairness_bp
FROM s
"""


# ====================================================== type inference
#
# Schema inference over untyped string data (the CSV/scrape ingest
# problem): classify every value of every virtual column with anchored
# regex classifiers (int / float / ISO date), count conformers, and
# infer the narrowest type that fits ALL values. The corpus builds four
# string columns per doc — pure int, float, date, and a mixed column
# that must correctly DEMOTE to string. Patterns are byte-identical
# between Python re and DuckDB regexp_full_matches, so the oracle checks
# the classifiers themselves, not just the verdicts.

_INT_RE = r"-?[0-9]+"
_FLOAT_RE = r"-?[0-9]+\.[0-9]+"
_DATE_RE = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"


def _virtual_cells(doc_id: int) -> list[tuple[str, str]]:
    return [
        ("a_int", str(doc_id)),
        ("b_float", f"{doc_id % 100}.{doc_id % 7}{doc_id % 3}"),
        ("c_date", f"2024-01-{1 + doc_id % 28:02d}"),
        ("d_mixed", str(doc_id) if doc_id % 2 == 0 else f"w{doc_id}"),
    ]


def q_infer_types(sf_dir: str):
    """(column_name, n_values, n_int_like, n_float_like, n_date_like,
    inferred_type): narrowest type fitting every value (int < float <
    date < string precedence; int-like values are NOT float-like — the
    classifiers are exclusive by pattern).

    Scale shape: per-batch per-column conformity-count combiner (4 rows
    per batch) -> bounded column groupby -> 4-row driver decision."""
    import re as _re

    d = _read(sf_dir, "documents", columns=["doc_id"])
    pats = {
        "n_int_like": _re.compile(_INT_RE),
        "n_float_like": _re.compile(_FLOAT_RE),
        "n_date_like": _re.compile(_DATE_RE),
    }

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {
            "column_name": [],
            "n_values": [],
            "n_int_like": [],
            "n_float_like": [],
            "n_date_like": [],
        }
        cells: dict[str, list[str]] = {}
        for i in df["doc_id"].to_numpy(np.int64):
            for col, v in _virtual_cells(int(i)):
                cells.setdefault(col, []).append(v)
        for col, vals in cells.items():
            rows["column_name"].append(col)
            rows["n_values"].append(len(vals))
            for key, pat in pats.items():
                rows[key].append(sum(1 for v in vals if pat.fullmatch(v)))
        out = pd.DataFrame(rows)
        return out.astype(
            {
                "n_values": np.int64,
                "n_int_like": np.int64,
                "n_float_like": np.int64,
                "n_date_like": np.int64,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("column_name", as_index=False)[
            ["n_values", "n_int_like", "n_float_like", "n_date_like"]
        ].sum()
        return out.astype(
            {c: np.int64 for c in out.columns if c != "column_name"}
        )

    h = (
        d.map_batches(counts, batch_format="pandas")
        .groupby("column_name")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: 4 rows
    if h.empty:
        return pd.DataFrame(
            {
                "column_name": pd.Series([], dtype=object),
                "n_values": pd.Series([], dtype=np.int64),
                "n_int_like": pd.Series([], dtype=np.int64),
                "n_float_like": pd.Series([], dtype=np.int64),
                "n_date_like": pd.Series([], dtype=np.int64),
                "inferred_type": pd.Series([], dtype=object),
            }
        )
    n = h["n_values"].to_numpy(np.int64)
    t = np.where(
        h["n_int_like"].to_numpy(np.int64) == n,
        "int",
        np.where(
            h["n_float_like"].to_numpy(np.int64) == n,
            "float",
            np.where(h["n_date_like"].to_numpy(np.int64) == n, "date", "string"),
        ),
    )
    h["inferred_type"] = t
    return h


INFER_TYPES_SQL = f"""
WITH cells AS (
  SELECT 'a_int' AS column_name, CAST(doc_id AS VARCHAR) AS v FROM documents
  UNION ALL
  SELECT 'b_float',
         CAST(doc_id % 100 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR)
           || CAST(doc_id % 3 AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'c_date', '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
  FROM documents
  UNION ALL
  SELECT 'd_mixed',
         CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR)
              ELSE 'w' || CAST(doc_id AS VARCHAR) END
  FROM documents
), c AS (
  SELECT column_name,
    CAST(COUNT(*) AS BIGINT) AS n_values,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_INT_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_int_like,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_FLOAT_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_float_like,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_DATE_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_date_like
  FROM cells GROUP BY 1
)
SELECT column_name, n_values, n_int_like, n_float_like, n_date_like,
  CASE WHEN n_int_like = n_values THEN 'int'
       WHEN n_float_like = n_values THEN 'float'
       WHEN n_date_like = n_values THEN 'date'
       ELSE 'string' END AS inferred_type
FROM c
"""


# ===================================================== interval union
#
# Gaps-and-islands interval merging: each event opens a 5-minute
# activity window; per user, merge overlapping/touching windows and
# report the union length — the "actual active time" measure (crawl
# connection-held time, user engagement time) that naive SUM(duration)
# double-counts.

IU_WINDOW_US = 5 * 60 * 1_000_000


def q_interval_union(sf_dir: str):
    """(user_id, n_events, n_islands, covered_us): merged-interval count
    and exact union length in microseconds.

    Scale shape: ONE coarse exchange on user_id; inside the task the
    island boundaries come from one sort + np.maximum.accumulate over
    the user's interval ends — no per-interval scan."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    kd = _with_coarse_group(ev, "user_id")

    def union(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_n, out_i, out_c = [], [], [], []
        for uid, rows in g.groupby("user_id"):
            s = np.sort(rows["ts"].astype("int64").to_numpy())
            e = s + IU_WINDOW_US
            if len(s) == 0:
                continue
            run_end = np.maximum.accumulate(e)
            new_island = np.ones(len(s), dtype=bool)
            new_island[1:] = s[1:] > run_end[:-1]
            isl = np.cumsum(new_island) - 1
            starts = s[new_island]
            # island end = run_end at the island's LAST event: run_end is
            # monotone and resets past an island boundary by construction
            # (review finding: the per-island rescan was O(islands·events))
            ends = run_end[np.flatnonzero(np.append(new_island[1:], True))]
            out_u.append(uid)
            out_n.append(len(s))
            out_i.append(int(isl[-1] + 1))
            out_c.append(int((ends - starts).sum()))
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_u, dtype=np.int64),
                "n_events": pd.Series(out_n, dtype=np.int64),
                "n_islands": pd.Series(out_i, dtype=np.int64),
                "covered_us": pd.Series(out_c, dtype=np.int64),
            }
        )

    return kd.groupby("_g").map_groups(union, batch_format="pandas")


INTERVAL_UNION_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS new_i
  FROM iv
), g AS (
  SELECT user_id, s, e,
         SUM(new_i) OVER (PARTITION BY user_id ORDER BY s, e) AS isl
  FROM m
), isl AS (
  SELECT user_id, isl, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY 1, 2
)
SELECT user_id,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM iv WHERE iv.user_id = isl.user_id)
    AS n_events,
  CAST(COUNT(*) AS BIGINT) AS n_islands,
  CAST(SUM(e - s) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id
"""


# =================================================== co-citation pairs
#
# Bipartite projection of the link graph: two pages are co-cited when
# one source links to both; pairs with support >= 2 are the
# "customers who bought X also bought Y" signal (collaborative
# filtering / related-pages). Pair fan-out is bounded per source
# (<= C(k,2), k <= 5 outlinks), so the projection never explodes.

COCITE_MIN_SUPPORT = 2


def q_cocitation_pairs(sf_dir: str):
    """(dst_a, dst_b, n_common) for dst_a < dst_b with support >= 2.

    Scale shape: per-source pair fan-out in the edge map (bounded by
    the outlink cap) -> ONE coarse exchange on the unordered pair key
    -> in-task count + support filter."""
    import pyarrow.parquet as _pq

    from .queries import internal_edges_np

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    d = _read(sf_dir, "documents", columns=["doc_id"])
    if n_docs == 0:
        return pd.DataFrame(
            {
                "dst_a": pd.Series([], dtype=np.int64),
                "dst_b": pd.Series([], dtype=np.int64),
                "n_common": pd.Series([], dtype=np.int64),
            }
        )

    def pairs(t: pa.Table) -> pd.DataFrame:
        src, dst = internal_edges_np(
            t.column("doc_id").to_numpy(), n_docs, drop_self=True
        )
        e = pd.DataFrame(
            {"src": pd.Series(src, dtype=np.int64), "dst": pd.Series(dst, dtype=np.int64)}
        ).drop_duplicates()
        # per-source pair fan-out as a vectorized self-merge: the outlink
        # cap (≤4 distinct dsts per src) bounds the blow-up at 6 pairs/src
        m = e.merge(e, on="src", suffixes=("_a", "_b"))
        m = m[m["dst_a"] < m["dst_b"]]
        out = m[["dst_a", "dst_b"]].reset_index(drop=True)
        out["pair"] = out["dst_a"] * np.int64(n_docs) + out["dst_b"]
        return out

    kd = _with_coarse_group(d.map_batches(pairs, batch_format="pyarrow"), "pair")

    def count(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["dst_a", "dst_b"], as_index=False).size()
        out.columns = ["dst_a", "dst_b", "n_common"]
        out = out[out["n_common"] >= COCITE_MIN_SUPPORT]
        return out.astype(np.int64)

    return kd.groupby("_g").map_groups(count, batch_format="pandas")


COCITATION_PAIRS_SQL = f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (
  SELECT doc_id,
    CAST(1 + CAST(concat('0x', substr(md5('lnkk:42:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) % 4 AS BIGINT) AS k
  FROM documents
),
e AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id
)
SELECT a.dst AS dst_a, b.dst AS dst_b, CAST(COUNT(*) AS BIGINT) AS n_common
FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2
HAVING COUNT(*) >= {COCITE_MIN_SUPPORT}
"""


WEBCORPUS_SQL_QUERIES: dict[str, tuple] = {
    "record_linkage": (q_record_linkage, RECORD_LINKAGE_SQL),
    "ring_rebalance": (q_ring_rebalance, _ring_rebalance_sql()),
    "kcore_peel": (q_kcore_peel, _kcore_sql()),
    "radix_quantiles": (
        q_radix_quantiles,
        _radix_sql(_RADIX_CENTS_CTE, "est_cents"),
    ),
    "funnel_latency": (q_funnel_latency, _funnel_latency_sql()),
    "minhash_error": (q_minhash_error, _minhash_error_sql()),
    "join_size_estimate": (q_join_size_estimate, JOIN_SIZE_ESTIMATE_SQL),
    "degree_assortativity": (q_degree_assortativity, DEGREE_ASSORTATIVITY_SQL),
    "cdc_chunks": (q_cdc_chunks, CDC_CHUNKS_SQL),
    "lru_hit_rate": (q_lru_hit_rate, LRU_HIT_RATE_SQL),
    "bm25_rank": (q_bm25_rank, _bm25_sql()),
    "late_data": (q_late_data, LATE_DATA_SQL),
    "product_quantize": (q_product_quantize, PRODUCT_QUANTIZE_SQL),
    "kmv_error": (q_kmv_error, _kmv_error_sql()),
    "fairness_index": (q_fairness_index, FAIRNESS_INDEX_SQL),
    "pq_recall": (q_pq_recall, _pq_recall_sql()),
    "path_templates": (q_path_templates, _path_templates_sql()),
    "top_decile_share": (q_top_decile_share, TOP_DECILE_SHARE_SQL),
    "infer_types": (q_infer_types, INFER_TYPES_SQL),
    "interval_union": (q_interval_union, INTERVAL_UNION_SQL),
    "cocitation_pairs": (q_cocitation_pairs, COCITATION_PAIRS_SQL),
    "burst_days": (q_burst_days, BURST_DAYS_SQL),
    "graph_reciprocity": (q_graph_reciprocity, GRAPH_RECIPROCITY_SQL),
    "token_simpson": (q_token_simpson, TOKEN_SIMPSON_SQL),
    "quantile_map": (q_quantile_map, QUANTILE_MAP_SQL),
    "props_stats": (q_props_stats, PROPS_STATS_SQL),
    "badword_filter": (q_badword_filter, _badword_sql()),
    "winnow_fingerprint": (q_winnow_fingerprint, WINNOW_FINGERPRINT_SQL),
    "crawl_trap_filter": (q_crawl_trap_filter, _crawl_trap_sql()),
    "activity_trend": (q_activity_trend, ACTIVITY_TREND_SQL),
    "consistent_hash_assign": (q_consistent_hash_assign, CONSISTENT_HASH_SQL),
    "zorder_index": (q_zorder_index, _zorder_sql()),
    "distribution_resample": (q_distribution_resample, _distribution_resample_sql()),
    "ip_anonymize": (q_ip_anonymize, _ip_anonymize_sql()),
    "politeness_audit": (q_politeness_audit, POLITENESS_AUDIT_SQL),
    "langid_confusion": (q_langid_confusion, _langid_confusion_sql()),
    "rank_normalize": (q_rank_normalize, RANK_NORMALIZE_SQL),
    "basket_lift": (q_basket_lift, BASKET_LIFT_SQL),
    "pareto_docs": (q_pareto_docs, PARETO_DOCS_SQL),
    "bitext_align": (q_bitext_align, BITEXT_ALIGN_SQL),
    "surt_keys": (q_surt_keys, SURT_KEYS_SQL),
    "ip_geo_join": (q_ip_geo_join, IP_GEO_JOIN_SQL),
    "table_extract": (q_table_extract, TABLE_EXTRACT_SQL),
    "charset_normalize": (q_charset_normalize, CHARSET_NORMALIZE_SQL),
    "mime_sniff": (q_mime_sniff, MIME_SNIFF_SQL),
}
