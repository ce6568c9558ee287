"""Experiment (A/B) analytics over the event log: deterministic
hash-based variant assignment + sequential-funnel conversion rates.

The assignment is the standard production pattern — a stable hash of
the unit id, never RNG — here ``md5_lower64(salt || user_id) % n``
(the repo's DuckDB bridge: byte-equal to ``md5_number_lower``), so the
split is reproducible across runs AND expressible in the oracle.
Conversion uses the ordered-funnel semantics of ``funnel_stages``: a
user converts when a purchase occurs STRICTLY after their first view
(ties at the same timestamp do not convert).

Scale shape: one bucketed user exchange (the repo's per-key pattern);
inside each bucket the funnel check is two pandas groupby-mins over
the bucket, and only (variant, n) integer partials leave it; the
final groupby is |variants|-sized.  Exact integer rate:
``cvr_micro = n_converted * 1e6 // n_exposed``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["ab_metrics"]


def _variant_of(user_id, salt: str, n_variants: int) -> int:
    d = hashlib.md5((salt + str(user_id)).encode("utf-8")).digest()
    return int.from_bytes(d[8:], "little") % n_variants


def ab_metrics(
    events_ds,
    expose_type: str = "view",
    convert_type: str = "purchase",
    salt: str = "ab",
    n_variants: int = 2,
    num_buckets: int | None = None,
):
    """(variant, n_users, n_exposed, n_converted, cvr_micro): users
    assigned to ``n_variants`` arms by stable hash; exposed = any
    ``expose_type`` event; converted = any ``convert_type`` event
    strictly after the user's FIRST exposure."""
    if num_buckets is None:
        from .joins import derive_num_partitions

        num_buckets = derive_num_partitions(events_ds, floor=64)
    from ray.data.aggregate import Sum

    from .ordered import _add_bucket

    def prep(b: pa.Table) -> pa.Table:
        if b.column("ts").null_count:
            raise ValueError(
                "ab_metrics: null ts values are unsupported — filter or "
                "fill them first (a NaN first-view min would cast to "
                "INT64_MIN and silently count the user exposed AND "
                "converted, while SQL's NULL comparisons count neither)"
            )
        ts_us = b.column("ts").cast(pa.int64())
        return pa.Table.from_arrays(
            [b.column("user_id"), ts_us, b.column("event_type")],
            names=["user_id", "ts_us", "event_type"],
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        first_view = (
            g.loc[g["event_type"] == expose_type]
            .groupby("user_id", sort=False)["ts_us"]
            .min()
        )
        conv = g.loc[g["event_type"] == convert_type, ["user_id", "ts_us"]]
        # fill_value keeps the reindex int64 end to end (the repo's
        # keep_latest/funnel nullable-float >= 2^53 hazard); -1 is safe
        # as "never exposed" because ts_us is epoch micros >= 0 and the
        # mask checks it explicitly before the comparison
        bound = first_view.reindex(
            conv["user_id"], fill_value=np.int64(-1)
        ).to_numpy(dtype=np.int64)
        mask = (bound != -1) & (conv["ts_us"].to_numpy() > bound)
        conv_users = set(conv.loc[mask, "user_id"].unique())
        users = g["user_id"].unique()
        rows: dict = {}
        for u in users:
            v = _variant_of(u, salt, n_variants)
            r = rows.setdefault(v, [0, 0, 0])
            r[0] += 1
            if u in first_view.index:
                r[1] += 1
            if u in conv_users:
                r[2] += 1
        ks = sorted(rows)
        return pa.table(
            {
                "variant": pa.array([np.int64(k) for k in ks], pa.int64()),
                "n_users": pa.array([rows[k][0] for k in ks], pa.int64()),
                "n_exposed": pa.array([rows[k][1] for k in ks], pa.int64()),
                "n_converted": pa.array([rows[k][2] for k in ks], pa.int64()),
            }
        )

    from .joins import run_bucket_groups

    agg = (
        run_bucket_groups(
            events_ds.map_batches(prep, batch_format="pyarrow").map_batches(
                lambda b: _add_bucket(b, "user_id", num_buckets),
                batch_format="pyarrow",
            ),
            num_buckets,
            per_bucket,
        )
        .groupby("variant")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_exposed", alias_name="n_exposed"),
            Sum("n_converted", alias_name="n_converted"),
        )
    )

    def derive(b: pa.Table) -> pa.Table:
        ne = b.column("n_exposed").to_numpy(zero_copy_only=False)
        nc = b.column("n_converted").to_numpy(zero_copy_only=False)
        cvr = np.where(ne > 0, (nc * 1_000_000) // np.maximum(ne, 1), 0)
        return b.append_column("cvr_micro", pa.array(cvr.astype(np.int64)))

    return agg.map_batches(derive, batch_format="pyarrow")
