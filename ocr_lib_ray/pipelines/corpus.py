"""Composed training-corpus pipeline: extraction → dedup → quality gate.

The end-to-end shape a 100 TB training-data job actually runs — every
stage is one of this repo's operators, chained on a single streaming
Dataset:

    pages → extract (kernel)                  [per-batch map]
          → fingerprint extracted text        [vectorized map]
          → exact dedup (min url per content) [one groupby on the hash]
          → quality gate (min content length) [vectorized filter]

The exact-dedup groupby keys on the md5 fingerprint, not the text
itself, so the shuffle moves 32-byte keys + urls — never the documents.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from ..config import DEFAULT_CONFIG, ExtractConfig
from .extract import extract_pipeline


def fingerprint_extracted(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [
            batch.column("url"),
            pa.array(fps, pa.string()),
            pc.utf8_length(batch.column("text")).cast(pa.int64()),
        ],
        names=["url", "fingerprint", "text_chars"],
    )


def clean_corpus(
    pages: rd.Dataset,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    min_chars: int = 40,
) -> rd.Dataset:
    """pages → surviving (url, text_chars) after dedup + quality gate."""
    extracted = extract_pipeline(pages, cfg)
    fps = extracted.map_batches(
        fingerprint_extracted, batch_format="pyarrow", zero_copy_batch=True
    )
    survivors = fps.groupby("fingerprint").aggregate(
        Min("url", alias_name="url"), Min("text_chars", alias_name="text_chars")
    )
    return survivors.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("text_chars"), min_chars)).select(
            ["url", "text_chars"]
        ),
        batch_format="pyarrow",
    )
