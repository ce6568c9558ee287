"""Streaming (incremental) session windows — actor-held state.

The batch :func:`ocr_lib_ray.functions.windows.sessionize` groups each
user's full history in one task; a STREAM cannot do that — sessions
must close incrementally as the event log advances, with bounded state
(only the OPEN sessions).  The Dataset API cannot express ordered
incremental delivery to a stateful consumer, so per the custom-operator
rule this drops to raw Ray actors (the last-resort tier) with the
assumptions documented:

* one ``SessionBucketWorker`` actor per key-hash bucket holds the open
  sessions of its users (state size = open sessions, not history);
* each bucket's feed must arrive in non-decreasing ts order — the
  sandbox feed sorts the fixture log on the driver (stable, so equal-ts
  events keep source order, matching the batch path's stable sort); a
  production deployment reads per-bucket ts-ordered log partitions and
  never sorts globally;
* closed sessions are emitted incrementally (drainable mid-stream via
  ``take_closed``); ``flush`` closes whatever remains at end-of-log.
* fault tolerance: actor state is NOT checkpointed — a worker death
  loses its bucket's open sessions.  A production stream checkpoints
  (bucket, last_ts, open-session snapshot) periodically and replays
  the log from the last checkpoint; the sandbox feed simply reruns.

Output and semantics are identical to the batch ``sessionize``
(equivalence-tested, and the driver query shares its SQL oracle).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("session_start_us", pa.int64()),
        ("n_events", pa.int64()),
        ("value_sum", pa.float64()),
    ]
)


@ray.remote
class SessionBucketWorker:
    """Open-session state for one key-hash bucket of users."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # user -> [session_id, start_us, last_us, n_events, value_sum]
        self.open: dict = {}
        self.closed: list = []

    def _close(self, user: int) -> None:
        sid, start, _last, n, vsum = self.open.pop(user)
        self.closed.append((user, sid, start, n, vsum))

    def process(self, users, ts_us, values) -> int:
        """Consume a ts-ordered slice; returns closed-so-far count."""
        for u, t, v in zip(users, ts_us, values):
            st = self.open.get(u)
            if st is None:
                self.open[u] = [0, t, t, 1, v]
            elif t - st[2] > self.gap_us:
                next_sid = st[0] + 1
                self._close(u)
                self.open[u] = [next_sid, t, t, 1, v]
            else:
                st[2] = t
                st[3] += 1
                st[4] += v
        return len(self.closed)

    def take_closed(self) -> pa.Table:
        """Drain sessions closed since the last drain (incremental)."""
        rows = self.closed
        self.closed = []
        return _rows_to_table(rows)

    def flush(self) -> pa.Table:
        """End of log: close every open session and drain everything."""
        for u in sorted(self.open):
            self._close(u)
        return self.take_closed()


def _rows_to_table(rows: list) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    return pa.Table.from_arrays(
        [
            pa.array(cols[0], pa.int64()),
            pa.array(cols[1], pa.int64()),
            pa.array(cols[2], pa.int64()),
            pa.array(cols[3], pa.int64()),
            pa.array(cols[4], pa.float64()),
        ],
        schema=SESSION_SCHEMA,
    )


def streaming_sessionize(
    events_ds,
    gap_seconds: int = 1800,
    num_buckets: int = 8,
    chunk_rows: int = 8192,
):
    """events Dataset → closed-sessions Dataset via incremental actors.

    The sandbox feed (driver-side ordered iteration over the fixture
    log) stands in for a real ordered log source — see the module
    docstring for the production layout.  Slices ship to workers
    round-robin-by-bucket with backpressure (await per chunk wave).
    """
    gap_us = gap_seconds * 1_000_000

    frames = [
        b.select(["user_id", "ts", "value"]).to_pandas()
        for b in events_ds.iter_batches(batch_format="pyarrow")
    ]
    log = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["user_id", "ts", "value"]
    )
    log["ts_us"] = log["ts"].astype("int64")
    log = log.sort_values("ts_us", kind="mergesort")  # stable: ties keep source order

    workers = [SessionBucketWorker.remote(gap_us) for _ in range(num_buckets)]
    users = log["user_id"].to_numpy(dtype=np.int64)
    ts_us = log["ts_us"].to_numpy(dtype=np.int64)
    values = log["value"].to_numpy(dtype=np.float64)
    buckets = np.fromiter(
        (zlib.crc32(str(u).encode()) % num_buckets for u in users),
        dtype=np.int64,
        count=len(users),
    )
    for lo in range(0, len(users), chunk_rows):
        hi = lo + chunk_rows
        pending = []
        for w in range(num_buckets):
            sel = buckets[lo:hi] == w
            if sel.any():
                pending.append(
                    workers[w].process.remote(
                        users[lo:hi][sel], ts_us[lo:hi][sel], values[lo:hi][sel]
                    )
                )
        ray.get(pending)  # backpressure: one in-flight wave per chunk

    import ray.data as rd

    tables = ray.get([w.flush.remote() for w in workers])
    return rd.from_arrow(pa.concat_tables(tables))
