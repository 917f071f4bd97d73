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

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, unquote, quote

import numpy as np
import pandas as pd

_HASH_KEY_1 = "europarl_seen_k1"  # must be 16 bytes
_HASH_KEY_2 = "europarl_seen_k2"

assert len(_HASH_KEY_1) == 16 and len(_HASH_KEY_2) == 16

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize_url(url: str) -> str:
    """Normalize a URL: lowercase scheme/host, strip fragment and default
    port, sort query params, collapse empty path to '/', decode-then-encode
    percent escapes of unreserved characters."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and _DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{host}:{port}"
    path = quote(unquote(parts.path), safe="/%:@!$&'()*+,;=~-._") or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


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
