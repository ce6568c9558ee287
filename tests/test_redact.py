"""PII redaction + BPE-ish token count unit goldens."""

import pyarrow as pa

from ocr_lib_ray.functions.redact import (
    bpe_token_count_batch,
    redact_batch,
    redact_text,
)


def test_redact_email_phone_ip_num():
    assert redact_text("mail john.doe+x@example.co.uk now") == "mail <EMAIL> now"
    assert redact_text("call +1 (555) 123-4567 today") == "call <PHONE> today"
    assert redact_text("host 192.168.1.100 up") == "host <IP> up"
    assert redact_text("acct 1234567890123 ok") == "acct <NUM> ok"
    assert redact_text("clean text stays clean") == "clean text stays clean"
    # short numbers survive
    assert redact_text("year 2026 and zip 94110") == "year 2026 and zip 94110"


def test_redact_deterministic_order():
    # an email containing digits is hit by the email rule first, whole
    s = "x 12345678901@example.com y"
    assert redact_text(s) == "x <EMAIL> y"


def test_bpe_token_count():
    batch = pa.Table.from_arrays(
        [
            pa.array([1, 2, 3], pa.int64()),
            pa.array(["hello world", "don't stop", ""], pa.string()),
        ],
        names=["doc_id", "text"],
    )
    out = bpe_token_count_batch(batch)
    # "hello"," world" → 2 ; "don","'t"," stop" → 3 ; "" → 0
    assert out.column("n_bpe_tokens").to_pylist() == [2, 3, 0]


def test_redact_batch_shape():
    batch = pa.Table.from_arrays(
        [pa.array([7], pa.int64()), pa.array(["a@b.io called 192.168.0.1"], pa.string())],
        names=["doc_id", "text"],
    )
    out = redact_batch(batch)
    assert out.column("text_redacted").to_pylist() == ["<EMAIL> called <IP>"]


def test_entity_counts_planted_vs_duckdb():
    """Planted-entity cross-check: Arrow count_substring_regex and
    DuckDB regexp_extract_all are both RE2 leftmost non-overlapping
    scans — counts must match exactly on entity-dense text (the sf
    fixtures carry zero entities, so this test is the real pin)."""
    import duckdb
    import pyarrow as pa

    from ocr_lib_ray.functions.redact import entity_counts_batch

    texts = [
        "mail a@b.co and c.d+x@e-f.org, see https://x.io/p?q=1 http://y.z/",
        "ip 10.0.0.1 and 255.255.255.255; card 1234567890123456",
        "call +1 (555) 123-4567 or 0800 555 111 22",
        "",
        None,
        "no entities at all here",
    ]
    batch = pa.Table.from_arrays(
        [pa.array(list(range(6)), pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )
    got = entity_counts_batch(batch).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_emails"] == 2 and got.loc[0, "n_urls"] == 2
    assert got.loc[1, "n_ipv4"] == 2 and got.loc[1, "n_longnums"] == 1
    assert got.loc[2, "n_phones"] >= 1
    assert (got.loc[3] == 0).all() and (got.loc[4] == 0).all()

    con = duckdb.connect()
    con.register("docs", batch)
    want = con.execute(
        """
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(coalesce(text, ''),
                 'https?://[^ \\t\\n\\r\\f\\v]+')) AS n_urls,
               len(regexp_extract_all(coalesce(text, ''),
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ipv4,
               len(regexp_extract_all(coalesce(text, ''), '\\b[0-9]{9,}\\b'))
                 AS n_longnums,
               len(regexp_extract_all(coalesce(text, ''),
                 '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS n_phones
        FROM docs ORDER BY doc_id
        """
    ).df().set_index("doc_id")
    assert (got.astype("int64") == want.astype("int64")).all().all()


def test_extract_fields_planted_vs_duckdb():
    """First-match capture: Arrow extract_regex and DuckDB
    regexp_extract are both RE2 LEFTMOST scans, '' on no match — the
    planted texts pin the actual values (sf fixtures extract '')."""
    import duckdb
    import pyarrow as pa

    from ocr_lib_ray.functions.redact import extract_fields_batch

    texts = [
        "mail a@b.co and c.d+x@e-f.org, see https://x.io/p?q=1 http://y.z/",
        "ip 10.0.0.1 and 255.255.255.255; card 1234567890123456",
        "call +1 (555) 123-4567 now",
        "",
        None,
    ]
    batch = pa.Table.from_arrays(
        [pa.array(list(range(5)), pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )
    got = extract_fields_batch(batch).to_pandas().set_index("doc_id")
    assert got.loc[0, "email"] == "a@b.co"
    assert got.loc[0, "url"] == "https://x.io/p?q=1"
    assert got.loc[1, "ipv4"] == "10.0.0.1"
    assert got.loc[1, "longnum"] == "1234567890123456"
    assert (got.loc[3] == "").all() and (got.loc[4] == "").all()

    con = duckdb.connect()
    con.register("docs", batch)
    want = con.execute(
        """
        SELECT doc_id,
               regexp_extract(coalesce(text, ''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS email,
               regexp_extract(coalesce(text, ''),
                 'https?://[^ \\t\\n\\r\\f\\v]+') AS url,
               regexp_extract(coalesce(text, ''),
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b') AS ipv4,
               regexp_extract(coalesce(text, ''), '\\b[0-9]{9,}\\b') AS longnum,
               regexp_extract(coalesce(text, ''),
                 '\\+?[0-9][0-9()\\- ]{7,}[0-9]') AS phone
        FROM docs
        """
    ).df().set_index("doc_id")
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)
