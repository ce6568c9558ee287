"""WARC ingestion → the canonical pages table.

Common-Crawl-style corpora arrive as WARC (ISO 28500 "Web ARChive")
container files, not parquet.  The reference reads whatever container
the deployment hands it (``rw-image``, core_helper.clj:563-603); this
module is the WARC instance of the same pluggable-ingestion discipline
as :mod:`ocr_lib_ray.sources.text_files`: parse the container into ONE
canonical table shape — :data:`ocr_lib_ray.sources.pages.PAGES_SCHEMA`
``(url, warc_ts, html, text, lang)`` — so the extract pipeline and
every downstream operator stay storage-agnostic.

Pure stdlib (bytes scanning + :mod:`zlib`): no warcio dependency.
Supported on the happy path:

* plain ``.warc`` and member-gzipped ``.warc.gz`` (Common Crawl writes
  one gzip member per record; a whole-file single-member gzip also
  decompresses correctly through the same loop),
* ``response`` records carrying an HTTP response (status line +
  headers + body; ``Transfer-Encoding: chunked`` bodies are de-chunked)
  and ``resource`` records carrying the payload directly,
* other record types (``warcinfo``, ``request``, ``metadata``, …) are
  skipped — they describe the crawl, not the page.

Scale shape: ``read_binary_files`` makes one task per WARC file — the
standard Common-Crawl parallelism unit (~1 GB/file, ~64k files per
crawl), so a 100 TB crawl fans out to ~100k independent record-parse
tasks with no exchange anywhere.  Each file IS materialized as one
block while it is parsed (the format is not splittable without a CDX
index); keep per-file size at the crawl's native ~1 GB and the object
store streams/spills fine.  Record-level corruption fails LOUDLY by
default (``strict=True``) — a silently half-read shard poisons dedup
and manifest lineage; pass ``strict=False`` to stop at the first
structurally-truncated record instead (tail-truncated transfers).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pyarrow as pa

__all__ = ["parse_warc", "read_warc_pages", "warc_ts_us"]

_HDR_END = b"\r\n\r\n"


def _gunzip_members(buf: bytes) -> bytes:
    """Concatenate all gzip members in ``buf`` (CC: one per record)."""
    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf))
        out.append(d.flush())
        if not d.eof:  # truncated member: surface to the strict gate
            break
        buf = d.unused_data
    return b"".join(out)


def warc_ts_us(warc_date: str) -> int:
    """``WARC-Date`` (ISO 8601, always UTC per spec) → epoch micros."""
    dt = datetime.fromisoformat(warc_date.strip().replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("warc: truncated chunked body (no size line)")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        size = int(size_tok, 16)
        if size == 0:
            return b"".join(out)
        start = nl + 2
        if start + size > len(body):
            raise ValueError("warc: truncated chunked body (short chunk)")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload → body bytes (headers stripped,
    de-chunked when the response says chunked)."""
    hend = payload.find(_HDR_END)
    if hend < 0:  # headers never terminated: treat as headerless body
        return payload
    head = payload[:hend].decode("latin-1").lower()
    body = payload[hend + 4 :]
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if k.strip() == "transfer-encoding" and "chunked" in v:
            return _dechunk(body)
    return body


def parse_warc(buf: bytes, strict: bool = True):
    """Yield ``(url, ts_us, html_bytes)`` per response/resource record.

    ``buf`` is one whole WARC file (gzip members auto-detected).  A
    malformed record raises ``ValueError`` under ``strict`` (default);
    otherwise parsing stops cleanly at the corruption point.
    """
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2  # inter-record blank lines
        if pos >= n:
            return
        hend = buf.find(_HDR_END, pos)
        if hend < 0 or not buf.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(
                    f"warc: malformed record header at byte {pos}"
                )
            return
        headers: dict[str, str] = {}
        for line in buf[pos:hend].decode("latin-1").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    f"warc: record at byte {pos} has no valid Content-Length"
                )
            return
        payload = buf[hend + 4 : hend + 4 + clen]
        if len(payload) < clen:
            if strict:
                raise ValueError(
                    f"warc: record at byte {pos} truncated "
                    f"({len(payload)}/{clen} payload bytes)"
                )
            return
        pos = hend + 4 + clen
        rtype = headers.get("warc-type", "")
        if rtype in ("response", "resource"):
            url = headers.get("warc-target-uri", "").strip("<>")
            ts = warc_ts_us(headers["warc-date"]) if "warc-date" in headers else 0
            html = (
                _http_body(payload)
                if rtype == "response" and payload[:5] == b"HTTP/"
                else payload
            )
            yield url, ts, html


def read_warc_pages(paths, strict: bool = True):
    """WARC file(s)/dir → pages Dataset in ``PAGES_SCHEMA`` (``text``
    and ``lang`` empty — they are extraction OUTPUTS; the synthetic
    fixture source carries goldens there, a real crawl does not)."""
    import ray.data as rd

    from .pages import PAGES_SCHEMA

    ds = rd.read_binary_files(paths, include_paths=False)

    def to_pages(batch: pa.Table) -> pa.Table:
        urls: list = []
        tss: list = []
        htmls: list = []
        for buf in batch.column("bytes"):
            for url, ts, html in parse_warc(buf.as_py(), strict=strict):
                urls.append(url)
                tss.append(ts)
                htmls.append(html)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")
