"""Batched model scoring (the "model inference stage" pattern).

A stand-in for neural quality/toxicity scorers in a real corpus
pipeline: an actor-pool stage that fetches a weight bundle ONCE per
actor (``ray.put`` broadcast), featurizes each batch vectorized, and
scores with a numpy matmul.  The model here is a deterministic logistic
regression with fixed public weights — no trained artifact exists in
this environment — but the plumbing (broadcast, actor init, batched
inference, score column out) is exactly what a real model needs; swap
``_DEFAULT_WEIGHTS``/``featurize`` for the real thing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: (stop_ratio, mean_word_len, alpha_ratio, top_word_ratio, log_len, bias)
_DEFAULT_WEIGHTS = np.array([2.0, 0.15, 3.0, -4.0, 0.25, -1.5])


def featurize(batch: pa.Table) -> np.ndarray:
    """documents batch → (n, 6) feature matrix (reuses QualityScore's
    deterministic signals + log length + bias)."""
    from .text_stats import QualityScore

    q = QualityScore()(batch)
    n = batch.num_rows
    feats = np.column_stack(
        [
            np.asarray(q.column("stop_ratio").to_pylist()),
            np.asarray(q.column("mean_word_len").to_pylist()),
            np.asarray(q.column("alpha_ratio").to_pylist()),
            np.asarray(q.column("top_word_ratio").to_pylist()),
            np.log1p([len(t or "") for t in batch.column("text").to_pylist()]),
            np.ones(n),
        ]
    )
    return feats


class ModelScorer:
    """Actor-pool stage: weights fetched once per actor in __init__."""

    def __init__(self, weights_ref=None):
        if weights_ref is not None:
            import ray

            self.w = np.asarray(ray.get(weights_ref), dtype=np.float64)
        else:
            self.w = _DEFAULT_WEIGHTS

    def __call__(self, batch: pa.Table) -> pa.Table:
        z = featurize(batch) @ self.w
        score = 1.0 / (1.0 + np.exp(-z))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(np.round(score, 6), pa.float64()),
            ],
            names=["doc_id", "quality_prob"],
        )


def score_documents(docs_ds, weights=None, concurrency=None, batch_size: int = 1024):
    """docs → (doc_id, quality_prob) via an actor pool with broadcast
    weights (the batched-inference stage shape).  ``concurrency=None``
    autoscales the pool to the cluster (see ocr_lib_ray.pool)."""
    import ray

    from ..pool import autoscale_pool

    if concurrency is None:
        concurrency = autoscale_pool()

    ref = ray.put(np.asarray(weights if weights is not None else _DEFAULT_WEIGHTS))
    return docs_ds.map_batches(
        ModelScorer,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
