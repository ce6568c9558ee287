"""Corpus-trained n-gram LM quality scoring (the CCNet/KenLM
perplexity-filter shape, with an honest tiny LM).

``bigram_logprob`` trains a word-bigram MLE model ON the corpus
(distributed count aggregation, vocabulary-sized shuffle) and scores
every document with it map-only — the standard "perplexity bucket"
curation signal, minus the external model download this sandbox cannot
do.  Deterministic end-to-end and DuckDB-oracle-able.

``ccnet_buckets`` composes it into the CCNet head/middle/tail
per-language tercile labeling (Wenzek et al. 2020).

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

__all__ = ["bigram_logprob", "ccnet_buckets", "train_bigram_model"]


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


def train_bigram_model(docs_ds, text_col: str = "text", max_vocab: int = 20_000_000):
    """Train the corpus word-bigram MLE count model and broadcast it:
    per-batch (key, cnt) partials → ONE vocabulary-sized groupby →
    driver collect → ``ray.put``.  Returns the object ref of a
    {token | 'w1 w2': count} dict.

    Web-scale bigram vocabularies are large; ``max_vocab`` guards the
    driver broadcast, and beyond it the op needs the bucketed join
    rewrite of ``linedup.remove_common_lines_join`` (explode pairs,
    bucket by pair hash, regroup by doc)."""
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
    return ray.put(model)


def _score_tokens(m: dict, toks: list) -> tuple:
    """(n_pairs, logprob_micro) of one token list under count model m.
    Identical double chain on both sides: floor(ln(c_bi/c_uni)*1e6+0.5)
    summed as exact int64."""
    total = 0
    np_ = 0
    for a, b2 in zip(toks, toks[1:]):
        total += math.floor(math.log(m[f"{a} {b2}"] / m[a]) * 1e6 + 0.5)
        np_ += 1
    return np_, total


def bigram_logprob(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 20_000_000,
    carry_cols: tuple = (),
    model_ref=None,
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
    ONE vocabulary-sized groupby (``train_bigram_model``; pass
    ``model_ref`` to reuse an already-trained model and skip it).
    Pass 2 is map-only against the ``ray.put`` model.
    """
    import ray

    ref = model_ref if model_ref is not None else train_bigram_model(
        docs_ds, text_col, max_vocab
    )

    def score(batch: pa.Table) -> pa.Table:
        from .text_stats import normalize_expr

        m = ray.get(ref)
        n_pairs, micros = [], []
        for t in normalize_expr(batch.column(text_col)).to_pylist():
            np_, total = _score_tokens(m, t.split(" ") if t else [])
            n_pairs.append(np_)
            micros.append(total)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(n_pairs, pa.int64()),
                pa.array(micros, pa.int64()),
            ]
            + [batch.column(c) for c in carry_cols],
            names=[id_col, "n_pairs", "logprob_micro", *carry_cols],
        )

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ccnet_buckets(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    carry_cols: tuple = (),
):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, "CCNet: Extracting high quality monolingual datasets from
    web crawl data"): score every document with the corpus-trained
    bigram LM, compute per-LANGUAGE tercile thresholds of the per-pair
    negative log-likelihood, and label each document ``head`` /
    ``middle`` / ``tail`` (head = lowest perplexity).  Output:
    (id, lang, nll_micro_per_pair, bucket, *carry_cols).

    Exactness: the per-doc statistic is ``(-logprob_micro) //
    n_pairs`` — int64 floor division of non-negative ints, bit-equal
    to the SQL ``//`` — and the tercile thresholds use the same
    quantile_disc index discipline as every quantile op here.  Docs
    with < 2 tokens score 0 (the best bucket; CCNet keeps trivially
    short docs for the LENGTH filters to judge, not the LM).

    Scale shape: the LM build is one vocabulary-sized shuffle
    (train_bigram_model); scoring is map-only; thresholds come from
    the fully distributed ``group_quantiles`` histogram (never a sort)
    and only |langs|×2 threshold rows reach the driver for the
    ``ray.put`` broadcast; labeling is map-only.  Only the THIN scored
    table (id, lang, nll — no text) is ever materialized (it feeds
    both the threshold histogram and, in the thin path, the labeling
    pass).  With ``carry_cols`` (e.g. text riding into a downstream
    gate) the wide columns are NOT pinned: the label pass re-scores
    ``docs_ds`` map-only against the already-trained broadcast model —
    one extra scoring scan instead of a corpus-text materialization or
    a join.
    """
    import numpy as np
    import ray

    from .quantiles import group_quantiles

    model_ref = train_bigram_model(docs_ds, text_col)
    scored = bigram_logprob(
        docs_ds, id_col, text_col, carry_cols=(lang_col,), model_ref=model_ref
    )

    def per_pair_stat(nll: "np.ndarray", n: "np.ndarray") -> "np.ndarray":
        return np.where(n > 0, nll // np.maximum(n, 1), 0).astype(np.int64)

    def per_pair(b: pa.Table) -> pa.Table:
        nll = -b.column("logprob_micro").to_numpy(zero_copy_only=False)
        n = b.column("n_pairs").to_numpy(zero_copy_only=False)
        q = per_pair_stat(nll, n)
        return pa.Table.from_arrays(
            [b.column(id_col), b.column(lang_col), pa.array(q, pa.int64())],
            names=[id_col, lang_col, "nll_micro_per_pair"],
        )

    stat = scored.map_batches(per_pair, batch_format="pyarrow").materialize()

    qs = (1 / 3, 2 / 3)
    th_rows = group_quantiles(stat, lang_col, "nll_micro_per_pair", qs=qs).take_all()
    t1 = {r[lang_col]: r["nll_micro_per_pair"] for r in th_rows if r["q"] == qs[0]}
    t2 = {r[lang_col]: r["nll_micro_per_pair"] for r in th_rows if r["q"] == qs[1]}
    th_ref = ray.put((t1, t2))

    def bucket_labels(langs: list, vals) -> pa.Array:
        lo, hi = ray.get(th_ref)
        return pa.array(
            [
                "head" if v <= lo[lg] else ("middle" if v <= hi[lg] else "tail")
                for lg, v in zip(langs, vals)
            ],
            pa.string(),
        )

    if not carry_cols:

        def label(b: pa.Table) -> pa.Table:
            return b.append_column(
                "bucket",
                bucket_labels(
                    b.column(lang_col).to_pylist(),
                    b.column("nll_micro_per_pair").to_pylist(),
                ),
            )

        return stat.map_batches(label, batch_format="pyarrow")

    def score_label(b: pa.Table) -> pa.Table:
        # wide path: re-score map-only (model already trained) so the
        # carried columns never sit in a materialized dataset
        from .text_stats import normalize_expr

        m = ray.get(model_ref)
        n_pairs, micros = [], []
        for t in normalize_expr(b.column(text_col)).to_pylist():
            np_, total = _score_tokens(m, t.split(" ") if t else [])
            n_pairs.append(np_)
            micros.append(total)
        q = per_pair_stat(
            -np.asarray(micros, dtype=np.int64), np.asarray(n_pairs, dtype=np.int64)
        )
        langs = b.column(lang_col).to_pylist()
        return pa.Table.from_arrays(
            [
                b.column(id_col),
                b.column(lang_col),
                pa.array(q, pa.int64()),
                bucket_labels(langs, q.tolist()),
            ]
            + [b.column(c) for c in carry_cols],
            names=[id_col, lang_col, "nll_micro_per_pair", "bucket", *carry_cols],
        )

    return docs_ds.map_batches(score_label, batch_format="pyarrow", zero_copy_batch=True)
