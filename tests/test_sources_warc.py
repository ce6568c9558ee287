"""WARC container ingestion (sources/warc.py).

Reference analog: pluggable deployment-handed input containers
(``rw-image``, core_helper.clj:563-603).  The fixture WARCs are built
in-memory byte-for-byte (no external libs), including the Common-Crawl
member-gzip layout, chunked HTTP bodies, and truncation corruption.
"""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from ocr_lib_ray.sources.warc import parse_warc, read_warc_pages, warc_ts_us

DATE = "2020-01-02T03:04:05Z"
DATE_US = warc_ts_us(DATE)


def rec(rtype: str, payload: bytes, url: str | None = None, date: str = DATE,
        extra: str = "") -> bytes:
    h = f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
    if url is not None:
        h += f"WARC-Target-URI: {url}\r\n"
    h += f"WARC-Date: {date}\r\n{extra}Content-Length: {len(payload)}\r\n"
    return h.encode("latin-1") + b"\r\n" + payload + b"\r\n\r\n"


def http(body: bytes, headers: str = "Content-Type: text/html\r\n") -> bytes:
    return b"HTTP/1.1 200 OK\r\n" + headers.encode() + b"\r\n" + body


def small_warc() -> bytes:
    return b"".join(
        [
            rec("warcinfo", b"software: test\r\n"),
            rec("request", b"GET / HTTP/1.1\r\n", url="http://a.test/"),
            rec("response", http(b"<html>alpha</html>"), url="http://a.test/"),
            rec(
                "response",
                http(
                    b"4\r\n<htm\r\nc\r\nl>beta</html\r\n1\r\n>\r\n0\r\n\r\n",
                    headers="Transfer-Encoding: chunked\r\n",
                ),
                url="http://b.test/",
            ),
            rec("resource", b"<html>gamma</html>", url="<http://c.test/>"),
            rec("metadata", b"fetch: ok\r\n", url="http://a.test/"),
        ]
    )


def test_parse_plain_warc_records():
    rows = list(parse_warc(small_warc()))
    assert [r[0] for r in rows] == [
        "http://a.test/", "http://b.test/", "http://c.test/"
    ]
    assert [r[2] for r in rows] == [
        b"<html>alpha</html>", b"<html>beta</html>", b"<html>gamma</html>"
    ]
    assert all(r[1] == DATE_US for r in rows)


def test_parse_member_gzip_equals_plain():
    plain = small_warc()
    members = b"".join(
        gzip.compress(r)
        for r in [
            rec("response", http(b"<html>alpha</html>"), url="http://a.test/"),
            rec("resource", b"<html>gamma</html>", url="http://c.test/"),
        ]
    )
    assert [r[2] for r in parse_warc(members)] == [
        b"<html>alpha</html>", b"<html>gamma</html>"
    ]
    # whole-file single-member gzip also round-trips
    assert list(parse_warc(gzip.compress(plain))) == list(parse_warc(plain))


def test_truncated_record_strict_raises_lax_stops():
    good = rec("response", http(b"<html>alpha</html>"), url="http://a.test/")
    trunc = rec("response", http(b"<html>beta-full</html>"), url="http://b.test/")
    buf = good + trunc[: len(trunc) - 12]  # cut into the payload
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(buf))
    rows = list(parse_warc(buf, strict=False))
    assert [r[0] for r in rows] == ["http://a.test/"]
    with pytest.raises(ValueError, match="malformed"):
        list(parse_warc(b"NOT-A-WARC\r\n\r\n"))


def test_warc_date_variants():
    assert warc_ts_us("2020-01-01T00:00:00Z") == 1577836800_000_000
    assert warc_ts_us("2020-01-01T00:00:00.250000Z") == 1577836800_250_000
    assert warc_ts_us("2020-01-01T01:00:00+01:00") == 1577836800_000_000


@pytest.mark.usefixtures("ray_session")
def test_read_warc_pages_feeds_extract_pipeline(tmp_path):
    """End-to-end: fixture pages wrapped in a real WARC container must
    extract byte-identically to the same pages read directly."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_lib_ray.pipelines.extract import extract_pipeline
    from ocr_lib_ray.sources.pages import synthesize_pages_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).slice(0, 40)
    pages = synthesize_pages_batch(docs)
    warc = b"".join(
        rec("response", http(h.as_py()), url=u.as_py())
        for u, h in zip(pages.column("url"), pages.column("html"))
    )
    p = tmp_path / "shard-00000.warc.gz"
    p.write_bytes(gzip.compress(warc))

    got = (
        read_warc_pages(str(p))
        .map_batches(
            lambda b: b.select(["url", "html"]), batch_format="pyarrow"
        )
        .take_all()
    )
    assert len(got) == pages.num_rows
    assert {r["url"] for r in got} == set(pages.column("url").to_pylist())

    direct = {
        r["url"]: r["text"]
        for r in extract_pipeline(rd.from_arrow(pages)).take_all()
    }
    via_warc = {
        r["url"]: r["text"]
        for r in extract_pipeline(read_warc_pages(str(p))).take_all()
    }
    assert via_warc == direct
