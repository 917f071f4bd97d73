"""URL canonicalization + 128-bit hashing for the seen-set.

The reference's exact-dedup key is the raw ``(rule_id, url)`` pair under a
UNIQUE constraint (``/root/reference/europarl/db/url.py:45,71-77``) — no
canonicalization at all. The rebuild keeps raw-url equality as the dedup
contract (so the seen-set matches the reference byte-for-byte) but also
ships a canonicalizer for the Common-Crawl-style input where fragments /
query-param order / default ports vary.

Hashes: two independent 64-bit hashes per url via ``pandas.util.hash_array``
with different hash keys (SipHash-based, C-vectorized). They serve as
(h1, h2) for Kirsch-Mitzenmacher double hashing in the Bloom shards and as
the partitioning key (``h1 % num_shards``).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

import numpy as np
import pandas as pd

_HASH_KEY_1 = "europarl_seen_k1"  # must be 16 bytes
_HASH_KEY_2 = "europarl_seen_k2"

assert len(_HASH_KEY_1) == 16 and len(_HASH_KEY_2) == 16

_DEFAULT_PORTS = {"http": "80", "https": "443"}

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _normalize_pct(path: str) -> str:
    """RFC 3986 §6.2.2: decode percent-escapes of UNRESERVED characters
    only (never %2F etc. — an encoded slash is not a path separator) and
    uppercase the hex of the rest. Idempotent by construction."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, path)


def _normalize_netloc(netloc: str, scheme: str) -> str:
    """Lowercase the HOST only; keep userinfo verbatim and IPv6 brackets
    intact; strip a default port."""
    userinfo, sep, hostport = netloc.rpartition("@")
    if hostport.startswith("["):  # IPv6 literal
        end = hostport.find("]")
        host = hostport[: end + 1].lower() if end >= 0 else hostport.lower()
        rest = hostport[end + 1 :] if end >= 0 else ""
        port = rest[1:] if rest.startswith(":") else ""
    else:
        host, _, port = hostport.partition(":")
        host = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme):
        host = f"{host}:{port}"
    return (userinfo + sep + host) if sep else host


_C0_OR_SPACE = "".join(chr(i) for i in range(0x21))


def _sanitize(url: str) -> str:
    """WHATWG-style pre-clean (what urlsplit does internally, applied to a
    fixed point so canonicalization stays idempotent): drop tab/CR/LF
    anywhere, strip C0 controls / spaces / unicode whitespace at the ends."""
    s = url.translate({9: None, 10: None, 13: None})
    while True:
        t = s.strip().strip(_C0_OR_SPACE)
        if t == s:
            return s
        s = t


def _canonicalize_once(url: str) -> str:
    url = _sanitize(url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = _normalize_netloc(parts.netloc, scheme)
    path = _normalize_pct(parts.path) or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_url(url: str) -> str:
    """Normalize a URL: lowercase scheme/host, strip fragment and default
    port, sort query params, collapse empty path to '/', decode percent
    escapes of unreserved characters only.

    Iterated to a fixed point: a single pass is *not* idempotent because
    stripping the fragment (or an empty query) can expose trailing
    whitespace that ``_sanitize`` only sees on the next pass (e.g.
    ``'0 #'`` → ``'0 '`` → ``'0'``). Bounded loop — each pass only
    removes characters, so it terminates."""
    out = url
    for _ in range(8):
        nxt = _canonicalize_once(out)
        if nxt == out:
            return out
        out = nxt
    return out


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def hash_urls(urls) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hash pair for an array/sequence of url strings."""
    arr = np.asarray(urls, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_HASH_KEY_1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_HASH_KEY_2, categorize=False)
    return h1, h2


def hosts_vec(urls) -> np.ndarray:
    """Vectorized-ish host extraction (pure-python per element, small cost
    relative to hashing; urls in this domain share a tiny host set)."""
    return np.asarray([host_of(u) for u in urls], dtype=object)
