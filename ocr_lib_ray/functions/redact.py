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
