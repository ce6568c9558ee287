"""PII redaction (training-data op): deterministic regex scrubbing of
emails, phone numbers, IPv4 addresses and long digit runs.

Patterns are RE2-compatible (no backreferences/lookaround) so the exact
same expressions run in DuckDB's regexp_replace for the oracle.  Order
matters and is fixed: email → ipv4 → long digit runs → phone — the
bare-digit-run rule must precede the phone rule or it is unreachable
(any 9+ digit run also matches the phone pattern).
"""

from __future__ import annotations

import re

import pyarrow as pa

# RE2-safe patterns (also used verbatim in the SQL oracle)
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
LONGNUM = r"\b[0-9]{9,}\b"

_RULES = [
    (re.compile(EMAIL), "<EMAIL>"),
    (re.compile(IPV4), "<IP>"),
    (re.compile(LONGNUM), "<NUM>"),
    (re.compile(PHONE), "<PHONE>"),
]


def redact_text(text: str) -> str:
    text = text or ""  # null text cells are legal Arrow input
    for rx, repl in _RULES:
        text = rx.sub(repl, text)
    return text


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array([redact_text(t) for t in texts], pa.string()),
        ],
        names=["doc_id", "text_redacted"],
    )


# --- BPE-ish subword token counting ---------------------------------------

#: GPT2-style pretokenizer, simplified to the RE2-compatible subset
#: (no lookahead): contractions, letter runs, digit runs, punctuation
#: runs, whitespace runs.
BPE_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
_BPE_RE = re.compile(BPE_SPLIT)


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    counts = [len(_BPE_RE.findall(t or "")) for t in texts]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(counts, pa.int64())],
        names=["doc_id", "n_bpe_tokens"],
    )


# --- entity counting --------------------------------------------------------

#: RE2-safe URL pattern (explicit whitespace class — '\s' shorthand kept
#: out so the Arrow and DuckDB compiles cannot diverge on flag defaults)
URL = r"https?://[^ \t\n\r\f\v]+"


def entity_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document counts of emails / URLs / IPv4s / long digit runs /
    phone-shaped spans over the RAW text — the PII-density signal used
    to route documents to redaction or rejection.

    Fully vectorized: ``pyarrow.compute.count_substring_regex`` runs
    RE2 over the Arrow buffer with no Python loop, and DuckDB's
    ``regexp_extract_all`` is the same RE2 non-overlapping leftmost
    scan, so counts match bit-for-bit.  Each pattern is counted
    independently on the raw text (unlike ``redact_batch``, where rule
    ORDER matters because earlier rules consume characters).
    """
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column(text_col), "")
    arrays = [batch.column("doc_id")]
    names = ["doc_id"]
    for name, pat in (
        ("n_emails", EMAIL),
        ("n_urls", URL),
        ("n_ipv4", IPV4),
        ("n_longnums", LONGNUM),
        ("n_phones", PHONE),
    ):
        arrays.append(pc.count_substring_regex(col, pat).cast(pa.int64()))
        names.append(name)
    return pa.Table.from_arrays(arrays, names=names)


def extract_fields_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Structured first-match extraction: the FIRST email / URL / IPv4 /
    long digit run / phone-shaped span of each document as typed string
    columns — the capture sibling of :func:`entity_counts_batch` (route
    on the counts, extract the value).  Non-matching documents get the
    empty string, matching DuckDB's ``regexp_extract`` contract, so
    the column never mixes null and '' (a hash-ambiguity the oracle
    could not express).

    Vectorized: one ``pyarrow.compute.extract_regex`` (RE2 leftmost
    match over the Arrow buffer) per pattern; DuckDB's
    ``regexp_extract`` is the same RE2 leftmost scan — bit-equal.
    """
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column(text_col), "")
    arrays = [batch.column("doc_id")]
    names = ["doc_id"]
    for name, pat in (
        ("email", EMAIL),
        ("url", URL),
        ("ipv4", IPV4),
        ("longnum", LONGNUM),
        ("phone", PHONE),
    ):
        st = pc.extract_regex(col, f"(?P<m>{pat})")
        val = pc.fill_null(pc.struct_field(st, "m"), "")
        arrays.append(val)
        names.append(name)
    return pa.Table.from_arrays(arrays, names=names)
