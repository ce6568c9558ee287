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
