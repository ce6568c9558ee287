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


def build_training_data(
    pages: rd.Dataset,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    min_quality: float = 0.5,
    chunk_size: int = 32,
    chunk_overlap: int = 8,
    pack_budget: int = 128,
) -> rd.Dataset:
    """The full web-corpus → training-data pipeline, every stage one of
    this repo's operators on a single streaming Dataset:

        pages → extract (kernel)                 [map, tasks]
              → PII redact                       [vectorized map]
              → cross-doc repeated-line removal  [2 shuffle-light passes]
              → exact dedup (md5 groupby)        [32-byte-key shuffle]
              → model quality gate               [actor pool, broadcast w]
              → token-window chunking            [map]
              → sequence packing                 [hash-partition groupby]

    Returns packed-sequence rows (partition_id, seq_id, n_chunks,
    total_tokens).  Near-dup (minhash) dedup plugs in between exact
    dedup and scoring when the corpus calls for it (same Dataset shape).
    """
    from ray.data.aggregate import Min

    from ..functions.chunking import chunk_documents_batch, pack_sequences
    from ..functions.linedup import remove_common_lines

    extracted = extract_pipeline(pages, cfg)

    # redact over extracted text; keep url as the doc key
    def redact_extracted(batch: pa.Table) -> pa.Table:
        from ..functions.redact import redact_text

        texts = [redact_text(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("url"), pa.array(texts, pa.string())],
            names=["doc_id", "text"],  # downstream ops key on doc_id
        )

    docs = extracted.map_batches(redact_extracted, batch_format="pyarrow")
    docs = remove_common_lines(docs, max_df=1)

    # exact dedup: min doc (url) per content hash
    fps = docs.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("doc_id"),
                b.column("text"),
                pa.array(
                    [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in b.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            ],
            names=["doc_id", "text", "fp"],
        ),
        batch_format="pyarrow",
    )
    deduped = fps.groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"), Min("text", alias_name="text")
    )

    # model quality gate: score and filter INLINE so text rides along —
    # no corpus-sized keep-set broadcast, no join
    import numpy as np

    from ..functions.scoring import _DEFAULT_WEIGHTS, featurize

    def score_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["doc_id", "text"])
        z = featurize(batch) @ _DEFAULT_WEIGHTS
        prob = 1.0 / (1.0 + np.exp(-z))
        return batch.filter(pa.array(prob >= min_quality)).select(["doc_id", "text"])

    survivors = deduped.map_batches(score_filter, batch_format="pyarrow")
    chunks = survivors.map_batches(
        lambda b: chunk_documents_batch(b, chunk_size, chunk_overlap),
        batch_format="pyarrow",
    )
    return pack_sequences(chunks, budget=pack_budget)


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
