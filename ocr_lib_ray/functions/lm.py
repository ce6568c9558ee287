"""Corpus-trained n-gram LM quality scoring (the CCNet/KenLM
perplexity-filter shape, with an honest tiny LM).

``bigram_logprob`` trains a word-bigram MLE model ON the corpus
(distributed count aggregation, vocabulary-sized shuffle) and scores
every document with it map-only — the standard "perplexity bucket"
curation signal, minus the external model download this sandbox cannot
do.  Deterministic end-to-end and DuckDB-oracle-able.

Exactness discipline: per-pair log-probabilities are converted to
MICRO-units (``floor(ln(p) * 1e6 + 0.5)`` — the identical double
arithmetic on both sides, libm ``ln`` == DuckDB ``ln``) and summed as
int64, so the per-document reduction is exact and order-free; a float
mean would hash-diverge on summation order.  Consumers derive
perplexity-style scores as ``exp(-logprob_micro / 1e6 / n_pairs)``.
"""

from __future__ import annotations

import math

import pyarrow as pa

__all__ = ["bigram_logprob"]


def _pair_count_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch combiner: (key, cnt) rows where key is a token
    (unigram count) or 'w1 w2' (bigram count — injective: tokens never
    contain spaces post-collapse_ws).  Occurrence counts, not df."""
    from collections import Counter

    from .text_stats import normalize_expr

    counts: Counter = Counter()
    for t in normalize_expr(batch.column(text_col)).to_pylist():
        toks = t.split(" ") if t else []
        counts.update(toks)
        counts.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    keys = list(counts.keys())
    return pa.Table.from_arrays(
        [pa.array(keys, pa.string()), pa.array([counts[k] for k in keys], pa.int64())],
        names=["key", "cnt"],
    )


def bigram_logprob(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 20_000_000,
):
    """(id, n_pairs, logprob_micro) per document under the corpus's own
    word-bigram MLE model: logprob_micro = Σ over adjacent token pairs
    of floor(ln(c(w1,w2) / c(w1)) * 1e6 + 0.5), an exact int64 sum.
    Documents with < 2 tokens emit (0, 0).

    Every pair is observed by construction (the model is trained on
    the corpus being scored), so MLE needs no smoothing here; scoring
    a DIFFERENT corpus against these counts needs an unseen-pair floor
    — use the decontaminate/dedup_against_reference cross-corpus ops
    as the pattern and add one before doing that.

    Scale shape: pass 1 ships per-batch (key, cnt) partials through
    ONE vocabulary-sized groupby (unigrams + bigrams — web-scale
    bigram vocabularies are large; ``max_vocab`` guards the driver
    broadcast, and beyond it the op needs the bucketed join rewrite of
    ``linedup.remove_common_lines_join`` — explode pairs, bucket by
    pair hash, regroup by doc).  Pass 2 is map-only against the
    ``ray.put`` model.
    """
    import ray
    from ray.data.aggregate import Sum

    counts_tbl = (
        docs_ds.map_batches(
            lambda b: _pair_count_partials(b, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    n_keys = counts_tbl.count()  # metadata-only on a materialized dataset
    if n_keys > max_vocab:
        raise ValueError(
            f"model vocabulary {n_keys} exceeds max_vocab={max_vocab}; "
            "rebuild on the bucketed join pattern (see "
            "linedup.remove_common_lines_join) instead of the broadcast"
        )
    model: dict = {}
    for b in counts_tbl.iter_batches(batch_format="pyarrow"):
        model.update(zip(b.column("key").to_pylist(), b.column("cnt").to_pylist()))
    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        from .text_stats import normalize_expr

        m = ray.get(ref)
        n_pairs, micros = [], []
        for t in normalize_expr(batch.column(text_col)).to_pylist():
            toks = t.split(" ") if t else []
            total = 0
            np_ = 0
            for a, b2 in zip(toks, toks[1:]):
                # identical double product on both sides: ln(c_bi/c_uni)
                total += math.floor(
                    math.log(m[f"{a} {b2}"] / m[a]) * 1e6 + 0.5
                )
                np_ += 1
            n_pairs.append(np_)
            micros.append(total)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(n_pairs, pa.int64()),
                pa.array(micros, pa.int64()),
            ],
            names=[id_col, "n_pairs", "logprob_micro"],
        )

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
