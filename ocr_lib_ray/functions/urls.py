"""URL canonicalization (training-data op): deterministic normal form
for dedup keys and partition stability.

Rules (fixed, documented — part of the reproducibility contract):
lowercase scheme+host, strip default ports, drop fragment, drop common
tracking params (utm_*, fbclid, gclid), sort remaining query params
bytewise, collapse duplicate slashes in the path, strip trailing slash
(except root).  Pure stdlib urllib parsing; no network, no IDNA
lookups.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"fbclid", "gclid", "msclkid", "mc_cid", "mc_eid"}
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    url = url.strip()
    try:
        parts = urlsplit(url)
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port  # raises ValueError on non-numeric/out-of-range
    except ValueError:
        # unparseable urls pass through verbatim (deterministic no-op)
        return url
    scheme = parts.scheme.lower()
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.lower().startswith(_TRACKING_PREFIXES)
        and k.lower() not in _TRACKING_KEYS
    ]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def canonicalize_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    urls = batch.column(url_col).to_pylist()
    return batch.append_column(
        "url_canonical", pa.array([canonicalize_url(u) for u in urls], pa.string())
    )
