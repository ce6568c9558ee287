"""Distributed exact quantiles over a bounded-domain numeric column.

The standard corpus-curation question — "what is the P50/P90/P99
document length?" — needs exact quantiles over 10^12 rows.  A global
``sort`` is an all-to-all shuffle of every row; sampling sketches are
approximate.  For the columns this actually gets asked of (token
counts, line counts, chunk counts — small-integer domains), the scale
answer is a HISTOGRAM: a map-side ``value_counts`` per batch, one tiny
``groupby(value)`` shuffle of (value, count) partials — distinct-
values-sized, not corpus-sized — then a driver cumulative sum over the
collected histogram to read the order statistics off exactly.

The quantile definition matches DuckDB ``quantile_disc`` bit-for-bit
(index ``max(0, ceil(q*n) - 1)`` into the sorted values, the discrete
lower-order statistic; verified empirically and pinned by the oracle):
both sides compute ``ceil`` of the same IEEE double product, so the
driver query hash-verifies.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc


def _check_qs(qs) -> None:
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(
            f"quantile fractions must be in [0, 1], got {bad} — an out-of-"
            "range q would otherwise surface as an opaque length mismatch"
        )


def histogram_quantiles(
    ds,
    col: str,
    qs=(0.25, 0.5, 0.75, 0.9, 0.99),
    max_distinct: int = 1_000_000,
):
    """Exact quantiles of ``ds[col]`` → pyarrow Table (q, <col>).

    ``max_distinct`` guards the driver-collected histogram: the method
    is for bounded-domain columns (counts, sizes, years).  A column
    with more distinct values than that (float scores, timestamps)
    needs a sort-based or sketch path instead — the raise says so
    rather than silently melting the driver.

    Nulls are ignored (SQL aggregate semantics).  Returns an empty
    table when every value is null / the dataset is empty.
    """
    from ray.data.aggregate import Sum

    _check_qs(qs)

    def partials(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column(col).drop_null().combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=[col, "cnt"],
        )

    hist = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    n_distinct = hist.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"{n_distinct} distinct values exceeds max_distinct="
            f"{max_distinct}: histogram_quantiles is for bounded-domain "
            "columns — use a sort-based quantile for continuous data"
        )
    rows = sorted(
        (r[col], r["cnt"]) for b in hist.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    try:
        sch = hist.schema()
        val_type = sch.types[sch.names.index(col)]
        if not isinstance(val_type, pa.DataType):
            val_type = pa.int64()
    except Exception:  # empty dataset: no schema to read
        val_type = pa.int64()
    if not rows:
        return pa.Table.from_arrays(
            [pa.array([], pa.float64()), pa.array([], val_type)],
            names=["q", col],
        )
    total = sum(c for _, c in rows)
    out = []
    for q in qs:
        # DuckDB quantile_disc: sorted index max(0, ceil(q*n) - 1);
        # same IEEE double product on both sides, so boundary cases
        # (q*n landing on an integer ± 1 ulp) agree bit-for-bit
        target = max(0, math.ceil(q * total) - 1)
        cum = 0
        for v, c in rows:
            cum += c
            if cum > target:
                out.append(v)
                break
    return pa.Table.from_arrays(
        [pa.array(list(qs), pa.float64()), pa.array(out, val_type)],
        names=["q", col],
    )


def quantile_band_filter(
    ds,
    col: str,
    lo_q: float = 0.1,
    hi_q: float = 0.9,
    max_distinct: int = 1_000_000,
):
    """Keep rows whose ``col`` lies inside the corpus-level
    ``[lo_q, hi_q]`` exact quantile band (inclusive) — the percentile
    outlier trim ("drop the shortest 10% and longest 10%") used to cut
    boilerplate stubs and concatenation monsters before training.

    Two passes over ``ds`` (quantile bounds, then a map-only filter):
    pass a cheap projection — or a materialized stats dataset — when
    upstream lineage is expensive to re-execute.  The bounds are two
    scalars, broadcast by closure capture (no shuffle in pass 2).
    Null values never match the band (SQL BETWEEN semantics); an
    all-null/empty column yields an empty result for the same reason.
    """
    _check_qs([lo_q, hi_q])
    if lo_q > hi_q:
        raise ValueError(f"lo_q {lo_q} > hi_q {hi_q}")
    bounds = histogram_quantiles(ds, col, (lo_q, hi_q), max_distinct)
    if bounds.num_rows == 0:
        lo, hi = None, None  # BETWEEN NULL — matches nothing
    else:
        lo = bounds.column(col)[0].as_py()
        hi = bounds.column(col)[1].as_py()

    def keep(b: pa.Table) -> pa.Table:
        if lo is None:
            return b.slice(0, 0)
        c = b.column(col)
        return b.filter(pc.and_kleene(pc.greater_equal(c, lo), pc.less_equal(c, hi)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sort_quantiles(
    ds,
    col: str,
    qs=(0.25, 0.5, 0.75, 0.9, 0.99),
):
    """Exact quantiles of a CONTINUOUS-domain column (float scores,
    timestamps) — the path :func:`histogram_quantiles`' ``max_distinct``
    raise points at.

    One distributed ``sort(col)`` (the unavoidable all-to-all for exact
    order statistics on an unbounded domain), then each target index is
    read via ``split_at_indices`` + ``limit(1)`` — per-quantile cost is
    one block read, never a driver-side scan of the sorted data.  The
    quantile definition matches DuckDB ``quantile_disc`` exactly
    (sorted index ``max(0, ceil(q*n) - 1)``).  Nulls are dropped first
    (SQL aggregate semantics).  Prefer :func:`histogram_quantiles`
    whenever the domain is bounded — it does the same job with a
    distinct-values-sized shuffle instead of a full sort.
    """
    _check_qs(qs)

    def drop_nulls(b: pa.Table) -> pa.Table:
        return b.select([col]).drop_null()

    ordered = (
        ds.map_batches(drop_nulls, batch_format="pyarrow", zero_copy_batch=True)
        .sort(col)
        .materialize()
    )
    total = ordered.count()  # metadata-only on a materialized dataset
    if total == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.float64()), pa.array([], pa.int64())],
            names=["q", col],
        )
    # one split pass shared by every quantile: split at each distinct
    # target index; the first row of each following split is the value
    targets = [max(0, math.ceil(q * total) - 1) for q in qs]
    uniq = sorted(set(targets))
    splits = ordered.split_at_indices(uniq)
    at: dict = {}
    for idx, part in zip(uniq, splits[1:]):
        at[idx] = part.limit(1).take(1)[0][col]
    vals = [at[t] for t in targets]
    sch = ordered.schema()
    vt = sch.types[sch.names.index(col)]
    return pa.Table.from_arrays(
        [
            pa.array(list(qs), pa.float64()),
            pa.array(vals, vt if isinstance(vt, pa.DataType) else None),
        ],
        names=["q", col],
    )


def group_quantiles(
    ds,
    group_col: str,
    col: str,
    qs=(0.25, 0.5, 0.75, 0.9, 0.99),
):
    """Per-group exact quantiles → Dataset (group_col, q, <col>).

    Same histogram discipline as :func:`histogram_quantiles` but fully
    distributed end-to-end: map-side (group, value) counts, one
    groupby(group, value) partial-sum shuffle (distinct-pairs-sized),
    then a groupby(group) ``map_groups`` reads each group's order
    statistics off its own histogram — the driver never sees data, so
    group count AND per-group domain size are both unbounded.  The
    quantile definition is the same DuckDB-quantile_disc index
    ``max(0, ceil(q*n) - 1)``.  Null VALUES are ignored; a group whose
    values are all null disappears (SQL aggregate semantics).  Null
    GROUP keys raise (SQL would keep a NULL group — silently dropping
    it would diverge from the oracle).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    _check_qs(qs)

    def partials(b: pa.Table) -> pa.Table:
        # loud raise on null GROUP keys (same discipline as
        # ranking.topk_per_group): the SQL analog keeps a NULL group,
        # drop_null below would silently lose it, and Ray's sort-based
        # groupby cannot shuffle None keys anyway
        if b.column(group_col).null_count:
            raise ValueError(
                f"group_quantiles: null keys in group column {group_col!r} "
                "are unsupported — filter or fill them first"
            )
        t = b.select([group_col, col]).drop_null()
        g = t.group_by([group_col, col]).aggregate([([], "count_all")])
        return pa.Table.from_arrays(
            [
                g.column(group_col),
                g.column(col),
                g.column("count_all").cast(pa.int64()),
            ],
            names=[group_col, col, "cnt"],
        )

    hist = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    qlist = list(qs)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        counts = g["cnt"].to_numpy()
        cum = counts.cumsum()
        total = int(cum[-1])
        vals = []
        for q in qlist:
            target = max(0, math.ceil(q * total) - 1)
            vals.append(g[col].iloc[int((cum <= target).sum())])
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]] * len(qlist),
                "q": qlist,
                col: vals,
            }
        )

    return hist.groupby(group_col).map_groups(finish, batch_format="pandas")
