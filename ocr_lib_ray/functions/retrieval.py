"""BM25 full-text retrieval over the corpus (Okapi BM25,
Robertson & Zaragoza 2009), Ray-Data-first.

The keyword-search counterpart to the embedding ANN family
(`similarity.py`): score every document against a small set of
bag-of-words queries and return the top-k per query.

Exactness discipline (shared with ``lm.bigram_logprob`` /
``importance.dsir_weights``): the per-(doc, term) BM25 contribution is
one IEEE double chain —

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))

(k1 = 1.2, b = 0.75, so k1+1 = 2.2 and 1-b = 0.25 are written as
literals in exactly this operation order on BOTH sides) — micro-floored
ONCE per (doc, term) and summed as int64 per (doc, query), so the
score is order-free and hash-oracle-able.

Scale shape (100 TB): pass 1 aggregates (term → df) ONLY over the
union of query terms (a tiny broadcast set) plus one (N, Σdl) stats
row — the shuffle is O(|query vocabulary|), never corpus-bounded.
The idf table is broadcast once with ``ray.put``; pass 2 is map-only
scoring; the final top-k uses `ranking.topk_per_group`'s per-block
prune, so at most k·|queries| rows per block reach the shuffle.
"""

from __future__ import annotations

import math

import pyarrow as pa

__all__ = ["bm25_topk"]

_K1 = 1.2
_B = 0.75


def bm25_topk(
    docs_ds,
    queries: dict,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-``k`` documents per query by BM25, deterministic tie-break
    (score_micro DESC, id ASC).  ``queries`` maps query_id → query
    string (whitespace-separated terms; duplicate terms in one query
    count once — standard bag-of-terms BM25).  Documents with zero
    matching terms never appear.  Output: (query_id, id, score_micro).
    """
    import ray
    from ray.data.aggregate import Sum

    from .ranking import topk_per_group
    from .text_stats import normalize_expr

    qterms = {qid: sorted(set(q.split())) for qid, q in queries.items()}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    vocab_set = set(vocab)

    def df_partials(batch: pa.Table) -> pa.Table:
        """(term, df, n_docs, sum_dl) partial rows; the stats live on a
        reserved ''-term row ('' can never be a token post-split)."""
        n_docs = 0
        sum_dl = 0
        df: dict = {}
        for t in normalize_expr(batch.column(text_col)).to_pylist():
            toks = t.split(" ") if t else []
            if not toks:
                continue
            n_docs += 1
            sum_dl += len(toks)
            for term in vocab_set.intersection(toks):
                df[term] = df.get(term, 0) + 1
        keys = list(df.keys()) + [""]
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.string()),
                pa.array([df[t] for t in keys[:-1]] + [0], pa.int64()),
                pa.array([0] * (len(keys) - 1) + [n_docs], pa.int64()),
                pa.array([0] * (len(keys) - 1) + [sum_dl], pa.int64()),
            ],
            names=["term", "df", "n_docs", "sum_dl"],
        )

    agg = (
        docs_ds.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_dl", alias_name="sum_dl"),
        )
    )
    df_map: dict = {}
    n_total = 0
    sum_dl_total = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        for term, df_, nd, sd in zip(
            b.column("term").to_pylist(),
            b.column("df").to_pylist(),
            b.column("n_docs").to_pylist(),
            b.column("sum_dl").to_pylist(),
        ):
            if term == "":
                n_total += nd
                sum_dl_total += sd
            else:
                df_map[term] = df_
    if n_total == 0:
        return docs_ds.map_batches(
            lambda b: pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=["query_id", id_col, "score_micro"],
            ),
            batch_format="pyarrow",
        )
    avgdl = sum_dl_total / n_total  # int/int → IEEE double, same as SQL
    idf = {
        t: math.log(1 + (n_total - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5))
        for t in vocab
    }
    model_ref = ray.put((idf, avgdl, qterms))

    def score(batch: pa.Table) -> pa.Table:
        idf_m, avg, qt = ray.get(model_ref)
        qids, ids, scores = [], [], []
        id_vals = batch.column(id_col).to_pylist()
        for did, t in zip(id_vals, normalize_expr(batch.column(text_col)).to_pylist()):
            toks = t.split(" ") if t else []
            if not toks:
                continue
            dl = len(toks)
            tf: dict = {}
            for w in toks:
                if w in idf_m:
                    tf[w] = tf.get(w, 0) + 1
            if not tf:
                continue
            for qid, terms in qt.items():
                s = 0
                for term in terms:
                    f = tf.get(term, 0)
                    if f:
                        # identical IEEE chain to the SQL oracle
                        s += math.floor(
                            idf_m[term]
                            * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl / avg))))
                            * 1e6
                            + 0.5
                        )
                if s:
                    qids.append(qid)
                    ids.append(did)
                    scores.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(qids, pa.string()),
                pa.array(ids, pa.int64()),
                pa.array(scores, pa.int64()),
            ],
            names=["query_id", id_col, "score_micro"],
        )

    scored = docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return topk_per_group(scored, "query_id", "score_micro", k, id_col)
