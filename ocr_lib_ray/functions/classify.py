"""Corpus-trained multinomial Naive Bayes classification.

The learned-classifier counterpart to the hand-profiled ``LangId``
heuristic and the inference-only ``model_score``: TRAIN a multinomial
NB model on the corpus's own (label, token) counts — the fasttext-
style "train a cheap classifier on labeled data, route every document
with it" curation pattern — and apply it map-only.  With labels =
``lang`` this is a learned language router; with labels = any
quality/domain column it is the classic quality-classifier filter.

Exactness discipline (same as ``lm.bigram_logprob``): per-(token,
class) log-likelihoods with add-one smoothing are micro-floored ONCE —
``floor(ln((cnt_wc + 1) / (T_c + V)) * 1e6 + 0.5)`` — and summed as
int64 per (doc, class) together with a micro-floored class prior
``ln(N_c / N)``, so scores are order-free; the argmax tie-break is
(score DESC, class ASC).  Every double op mirrors the DuckDB oracle.

Scale shape (100 TB): training is ONE vocabulary×classes-sized
groupby of (token, class, cnt) partials (never corpus-sized rows);
the model broadcasts once via ``ray.put`` (V × C int64 matrix —
``max_vocab`` guards the driver, beyond it re-shape on the bucketed
join pattern of ``linedup.remove_common_lines_join``); scoring is
map-only.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = ["nb_classify"]


def nb_classify(
    docs_ds,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 20_000_000,
):
    """(id, pred, score_micro) per document: pred = argmax over the
    label vocabulary of prior + Σ token log-likelihoods (micro-int),
    ties broken by label name ascending.  Token-less documents score
    prior-only (pred = the largest class, tie-broken by name).
    """
    import ray
    from ray.data.aggregate import Sum

    from .text_stats import normalize_expr

    def partials(batch: pa.Table) -> pa.Table:
        """(w, c, cnt, docs) rows; per-class doc counts ride on the
        reserved w='' row ('' is never a token post-normalize)."""
        if batch.column(label_col).null_count:
            # fail loudly: Ray's sort-based groupby cannot shuffle null
            # keys and SQL's GROUP BY would mint a NULL class — either
            # way a silent divergence; label or filter nulls first
            raise ValueError(
                f"nb_classify: null labels in {label_col!r} are unsupported"
            )
        counts: dict = {}
        docs: dict = {}
        for t, c in zip(
            normalize_expr(batch.column(text_col)).to_pylist(),
            batch.column(label_col).to_pylist(),
        ):
            docs[c] = docs.get(c, 0) + 1
            for w in t.split(" ") if t else []:
                counts[(w, c)] = counts.get((w, c), 0) + 1
        keys = list(counts.keys()) + [("", c) for c in docs]
        return pa.Table.from_arrays(
            [
                pa.array([k[0] for k in keys], pa.string()),
                pa.array([k[1] for k in keys], pa.string()),
                pa.array(
                    [counts.get(k, 0) for k in keys[: len(counts)]]
                    + [0] * len(docs),
                    pa.int64(),
                ),
                pa.array([0] * len(counts) + list(docs.values()), pa.int64()),
            ],
            names=["w", "c", "cnt", "docs"],
        )

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w", "c"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("docs", alias_name="docs"))
        .materialize()
    )
    if agg.count() > max_vocab:
        raise ValueError(
            f"(token, class) count {agg.count()} exceeds max_vocab="
            f"{max_vocab}; rebuild on the bucketed join pattern (see "
            "linedup.remove_common_lines_join) instead of the broadcast"
        )
    tok_counts: dict = {}
    n_docs_c: dict = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        for w, c, cnt, nd in zip(
            b.column("w").to_pylist(),
            b.column("c").to_pylist(),
            b.column("cnt").to_pylist(),
            b.column("docs").to_pylist(),
        ):
            if w == "":
                n_docs_c[c] = n_docs_c.get(c, 0) + nd
            else:
                tok_counts[(w, c)] = cnt

    classes = sorted(n_docs_c)  # ascending → np.argmax's first-max IS the tie-break
    c_idx = {c: i for i, c in enumerate(classes)}
    n_total = sum(n_docs_c.values())
    vocab = sorted({w for w, _ in tok_counts})
    v_size = len(vocab)
    t_c = np.zeros(len(classes), dtype=np.int64)
    for (w, c), cnt in tok_counts.items():
        t_c[c_idx[c]] += cnt

    def micro(x: float) -> int:
        return math.floor(x * 1e6 + 0.5)

    # per-class score of a token UNSEEN in that class (cnt = 0)
    default = np.array(
        [micro(math.log(1 / (int(t) + v_size))) for t in t_c], dtype=np.int64
    )
    lam = {}
    for w in vocab:
        row = default.copy()
        for ci, c in enumerate(classes):
            cnt = tok_counts.get((w, c))
            if cnt is not None:
                row[ci] = micro(math.log((cnt + 1) / (int(t_c[ci]) + v_size)))
        lam[w] = row
    priors = np.array(
        [micro(math.log(n_docs_c[c] / n_total)) for c in classes], dtype=np.int64
    )
    model_ref = ray.put((lam, default, priors, classes))

    def score(batch: pa.Table) -> pa.Table:
        lam_m, dflt, pri, cls = ray.get(model_ref)
        ids = batch.column(id_col)
        preds, scores = [], []
        for t in normalize_expr(batch.column(text_col)).to_pylist():
            s = pri.copy()
            for w in t.split(" ") if t else []:
                s += lam_m.get(w, dflt)
            best = int(np.argmax(s))  # first max = smallest class name
            preds.append(cls[best])
            scores.append(int(s[best]))
        return pa.Table.from_arrays(
            [ids, pa.array(preds, pa.string()), pa.array(scores, pa.int64())],
            names=[id_col, "pred", "score_micro"],
        )

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
