"""Semi-structured (JSON) property extraction over the event stream.

Production event logs carry a free-form JSON properties column; the
standard warehouse step is "extract a typed field and aggregate".
``props_stats`` does it Ray-Data-first: a map-only parse+project pass
emitting per-batch GROUPED partials, then one groups-sized Sum/Min/Max
shuffle — event rows never cross the wire, only (event_type, partial)
rows do.

Parse semantics are SQL's: a missing key, non-integer value, or
malformed JSON document yields NULL, which aggregates skip — mirrored
by DuckDB's ``json_extract`` + ``TRY_CAST`` in the oracle.  Values are
integers end-to-end, so the compare is bit-exact.

The per-row ``json.loads`` loop is the sandbox stand-in for a
vectorized JSON kernel (simdjson / pyarrow.json at scale); the
aggregate shape — partial combine before ONE tiny shuffle — is the
part that matters at 100 TB and is real.
"""

from __future__ import annotations

import json

import pyarrow as pa

__all__ = ["props_stats"]


def props_stats(events_ds, key: str = "k", type_col: str = "event_type"):
    """(event_type, n, k_sum, k_min, k_max) where n counts events whose
    ``props`` parse to an integer under ``key``; events with missing /
    malformed / non-integer props are excluded (SQL NULL semantics —
    strict: JSON strings/bools/doubles do NOT coerce), and a type whose
    every event is invalid is omitted rather than emitted with n=0."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(b: pa.Table) -> pa.Table:
        agg: dict = {}
        for et, p in zip(
            b.column(type_col).to_pylist(), b.column("props").to_pylist()
        ):
            try:
                v = json.loads(p)[key]
            except (TypeError, ValueError, KeyError):
                continue
            # bools are ints in Python but not in SQL's TRY_CAST
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            cur = agg.get(et)
            if cur is None:
                agg[et] = [1, v, v, v]
            else:
                cur[0] += 1
                cur[1] += v
                if v < cur[2]:
                    cur[2] = v
                if v > cur[3]:
                    cur[3] = v
        keys = list(agg.keys())
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.string()),
                pa.array([agg[k][0] for k in keys], pa.int64()),
                pa.array([agg[k][1] for k in keys], pa.int64()),
                pa.array([agg[k][2] for k in keys], pa.int64()),
                pa.array([agg[k][3] for k in keys], pa.int64()),
            ],
            names=[type_col, "n", "k_sum", "k_min", "k_max"],
        )

    return (
        events_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(type_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )
