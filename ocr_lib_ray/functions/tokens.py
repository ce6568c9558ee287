"""Corpus token statistics: the classic pre-aggregated wordcount plus a
deterministic top-k — the shuffle-aggregation pattern (partial combine
inside map_batches, then a small groupby over partials; see the Ray
guide "Aggregation at scale")."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from .text_stats import normalize_expr


def partial_token_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (token, n) row per distinct token."""
    norm = normalize_expr(batch.column("text")).to_pylist()
    counts: dict = {}
    for t in norm:
        if not t:
            continue
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    return pa.Table.from_arrays(
        [
            pa.array(list(counts.keys()), pa.string()),
            pa.array(list(counts.values()), pa.int64()),
        ],
        names=["token", "n"],
    )


def token_counts(docs_ds):
    """(token, n) over the whole corpus — one small shuffle over
    per-batch partials, never over raw tokens."""
    partials = docs_ds.map_batches(
        partial_token_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("token").aggregate(Sum("n", alias_name="n"))


def top_tokens(docs_ds, k: int = 20):
    """Top-k tokens by count; deterministic tie-break (n desc, token asc).

    The aggregated vocabulary is small, so the final sort/limit runs on
    the aggregate output, not the corpus.
    """
    counts = token_counts(docs_ds)
    # sort+limit over the (small) aggregate, not the corpus
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)
