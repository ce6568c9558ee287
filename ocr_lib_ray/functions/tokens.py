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


def partial_cooccurrence(batch: pa.Table, window: int) -> pa.Table:
    """Per-batch combiner for windowed co-occurrence: one
    (w1, w2, n_pairs) row per distinct unordered pair in the batch.

    Vectorized over the FLATTENED batch: all tokens in one numpy array
    with a doc index; for each offset d ≤ window, pair token[i] with
    token[i+d] where both sit in the same document — ``window`` strided
    comparisons instead of a per-row loop.
    """
    import numpy as np

    norm = normalize_expr(batch.column("text")).to_pylist()
    toks: list = []
    doc_idx: list = []
    for di, t in enumerate(norm):
        if not t:
            continue
        ws = t.split(" ")
        toks.extend(ws)
        doc_idx.extend([di] * len(ws))
    parts = []
    if toks:
        arr = np.asarray(toks, dtype=object)
        didx = np.asarray(doc_idx, dtype=np.int64)
        for d in range(1, window + 1):
            if d >= len(arr):
                break
            a, b = arr[:-d], arr[d:]
            same = didx[:-d] == didx[d:]
            a, b = a[same], b[same]
            lo = np.where(a <= b, a, b)
            hi = np.where(a <= b, b, a)
            parts.append(pd.DataFrame({"w1": lo, "w2": hi}))
    g = (
        pd.concat(parts, ignore_index=True)
        .groupby(["w1", "w2"], sort=False)
        .size()
        .reset_index(name="n_pairs")
        if parts
        else pd.DataFrame({"w1": [], "w2": [], "n_pairs": []})
    )
    # explicit types: an all-filtered batch (e.g. only one-token docs)
    # would otherwise emit null-typed w1/w2 and drift the stream schema
    return pa.Table.from_arrays(
        [
            pa.array(g["w1"], pa.string()),
            pa.array(g["w2"], pa.string()),
            pa.array(g["n_pairs"], pa.int64()),
        ],
        names=["w1", "w2", "n_pairs"],
    )


def cooccurrence_topk(docs_ds, window: int = 3, k: int = 30):
    """Top-k co-occurring token pairs within ``window`` positions inside
    a document (unordered; the collocation/PMI numerator).  Returns
    (w1, w2, n_pairs) with the deterministic total order
    (n_pairs desc, w1 asc, w2 asc).

    Shuffle discipline: per-batch PARTIAL pair counts combine before
    the groupby, so the exchange carries distinct-pairs-per-batch rows,
    not corpus token positions.  The pair space is vocabulary², so for
    open-vocabulary web text compose with a count cutoff or a
    first-pass vocabulary prune (top_tokens) before widening ``window``
    — the final sort here runs on the aggregated pair table.
    """
    partials = docs_ds.map_batches(
        lambda b: partial_cooccurrence(b, window),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = partials.groupby(["w1", "w2"]).aggregate(
        Sum("n_pairs", alias_name="n_pairs")
    )
    return counts.sort(
        ["n_pairs", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def partial_bpe_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-character-pair counts over word tokens — the
    symbol-pair statistics of BPE training round 1 (each later round
    would re-tokenize against the merges so far; round 1 is pure char
    pairs and is the distributed-counting step that dominates at
    corpus scale)."""
    from collections import Counter

    from .text_stats import normalize_expr

    counts: Counter = Counter()
    for t in normalize_expr(batch.column("text")).to_pylist():
        for w in t.split(" ") if t else []:
            counts.update(w[i : i + 2] for i in range(len(w) - 1))
    keys = list(counts.keys())
    return pa.Table.from_arrays(
        [pa.array(keys, pa.string()), pa.array([counts[k] for k in keys], pa.int64())],
        names=["pair", "n"],
    )


def bpe_pair_counts(docs_ds, k: int = 50):
    """Top-``k`` BPE merge candidates: (pair, n) of adjacent character
    pairs inside word tokens, ordered (n DESC, pair ASC) — the first
    merge BPE training would take (Sennrich et al. 2016), computed
    distributed.

    Scale shape: the pair space is alphabet², so per-batch Counter
    partials collapse each block to at most |Σ|² rows before ONE tiny
    groupby; the sort runs over the aggregated pair table (≤ |Σ|²
    rows), never corpus rows.
    """
    from ray.data.aggregate import Sum

    return (
        docs_ds.map_batches(
            partial_bpe_pairs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )
