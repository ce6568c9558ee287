"""Streaming sessionize: distributed per-bucket ordered feed + actor
state must equal the batch groupby sessionize, emit closed sessions
before end-of-log, and recover bit-identically from a checkpoint after
a worker is killed mid-stream."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_streaming_equals_batch_sessionize(sf_small):
    from ocr_lib_ray.functions.streaming import streaming_sessionize
    from ocr_lib_ray.functions.windows import sessionize

    events = rd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id", "ts", "value"])
    key = ["user_id", "session_id"]
    a = (
        sessionize(events, gap_seconds=1800)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        streaming_sessionize(events, gap_seconds=1800, num_buckets=4)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)[a.columns.tolist()]
    )
    ints = ["user_id", "session_id", "session_start_us", "n_events"]
    assert a[ints].equals(b[ints])
    # chunked partial sums re-associate float adds — compare at the
    # oracle's resolution (cents), like the salted variant
    assert (
        (a["value_sum"] * 100).round().astype("int64")
        == (b["value_sum"] * 100).round().astype("int64")
    ).all()


@pytest.mark.usefixtures("ray_session")
def test_streaming_incremental_emission():
    """Sessions close as the log advances — drainable before flush
    (vectorized consume: multiple users and gaps in one chunk)."""
    from ocr_lib_ray.functions.streaming import SessionBucketWorker

    w = SessionBucketWorker.remote(gap_us=100)
    ray.get(w.process.remote([1, 1], [0, 50], [1.0, 2.0]))  # one open session
    assert ray.get(w.take_closed.remote()).num_rows == 0
    ray.get(w.process.remote([1], [1000], [5.0]))  # gap > 100 closes it
    mid = ray.get(w.take_closed.remote())
    assert mid.num_rows == 1
    assert mid.column("n_events").to_pylist() == [2]
    assert mid.column("value_sum").to_pylist() == [3.0]
    end = ray.get(w.flush.remote())
    assert end.num_rows == 1  # the still-open second session
    assert end.column("session_id").to_pylist() == [1]

    # one chunk holding two users and an intra-chunk gap for user 2:
    # segment detection must split it (vectorized path)
    w2 = SessionBucketWorker.remote(gap_us=100)
    ray.get(
        w2.process.remote(
            [2, 3, 2, 3, 2], [0, 10, 50, 20, 500], [1.0, 1.0, 1.0, 1.0, 9.0]
        )
    )
    out = ray.get(w2.flush.remote()).to_pandas().sort_values(["user_id", "session_id"])
    assert out["user_id"].tolist() == [2, 2, 3]
    assert out["n_events"].tolist() == [2, 1, 2]
    assert out["value_sum"].tolist() == [2.0, 9.0, 2.0]


@pytest.mark.usefixtures("ray_session")
def test_prepare_bucket_log_ordered_partitions(tmp_path):
    """The layout job writes one ts-sorted partition per bucket, with
    every user's rows confined to its crc32 bucket."""
    import zlib

    import pyarrow.parquet as pq

    from ocr_lib_ray.functions.streaming import prepare_bucket_log

    df = pd.DataFrame(
        {
            "user_id": [7, 3, 7, 11, 3, 7],
            "ts": np.array([500, 100, 300, 200, 900, 50], dtype="int64"),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    paths = prepare_bucket_log(rd.from_pandas(df), num_buckets=3, log_dir=str(tmp_path))
    total = 0
    for bucket, path in paths.items():
        t = pq.read_table(path)
        total += t.num_rows
        ts = t.column("ts_us").to_pylist()
        assert ts == sorted(ts)  # per-bucket ts order
        for u in set(t.column("user_id").to_pylist()):
            assert zlib.crc32(str(u).encode()) % 3 == bucket
    assert total == len(df)


@pytest.mark.usefixtures("ray_session")
def test_streaming_checkpoint_replay_after_kill(tmp_path):
    """Kill a worker mid-stream after a checkpoint: the restored worker
    replays the un-checkpointed tail from the bucket's ordered log and
    the final output is BIT-identical to an uninterrupted run."""
    from ocr_lib_ray.functions.streaming import (
        SessionBucketWorker,
        feed_bucket,
        prepare_bucket_log,
        streaming_sessionize,
    )

    # deterministic log: 40 users × 30 events with gaps → many sessions
    n_users, per_user = 40, 30
    uid = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    step = np.tile(np.arange(per_user, dtype=np.int64), n_users)
    # every 7th event jumps past the gap → multiple sessions per user
    ts = step * 10 + (step // 7) * 10_000 + uid  # interleaved, unsorted overall
    df = pd.DataFrame({"user_id": uid, "ts": ts, "value": (step % 5) / 4.0})
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)  # shuffle rows
    events = rd.from_pandas(df)

    key = ["user_id", "session_id"]
    ref = (
        streaming_sessionize(events, gap_seconds=0, num_buckets=2, chunk_rows=64)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    # gap_seconds=0 → gap_us=0: every positive ts diff breaks — lots of
    # sessions; reference computed by the normal uninterrupted path
    assert len(ref) > n_users

    # manual run: bucket 0's worker is killed after 3 fed chunks
    log_dir = tmp_path / "log"
    paths = prepare_bucket_log(events, num_buckets=2, log_dir=str(log_dir))
    ckpt = {w: str(tmp_path / f"bucket-{w}.ckpt") for w in range(2)}
    workers = {w: SessionBucketWorker.remote(0) for w in range(2)}

    # bucket 1 runs to completion with periodic checkpoints
    ray.get(feed_bucket.remote(paths.get(1), workers[1], 64, ckpt[1], 1))
    # bucket 0: feed only 3 chunks (checkpoint every chunk), then kill
    fed = ray.get(
        feed_bucket.remote(paths.get(0), workers[0], 64, ckpt[0], 1, 0, 3)
    )
    assert fed == 3
    ray.kill(workers[0])

    # recovery: fresh worker restores the snapshot and replays the tail
    w0 = SessionBucketWorker.remote(0)
    start = ray.get(w0.restore.remote(ckpt[0]))
    assert start == 3  # checkpoint covered the 3 fed batches
    ray.get(feed_bucket.remote(paths.get(0), w0, 64, ckpt[0], 1, start))

    import pyarrow as pa

    tables = ray.get([w0.flush.remote(), workers[1].flush.remote()])
    got = (
        pa.concat_tables(tables)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)[ref.columns.tolist()]
    )
    assert ref.equals(got)  # bit-identical, floats included (same add order)


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_refuses_mismatched_feed_params(tmp_path):
    """A checkpoint's batch offset only addresses the same events under
    the same feed parameters — restore must refuse, not silently
    skip/replay the wrong events."""
    from ocr_lib_ray.functions.streaming import SessionBucketWorker

    w = SessionBucketWorker.remote(0)
    ray.get(w.process.remote([1], [10], [1.0]))
    meta = {"chunk_rows": 64, "num_buckets": 2, "gap_us": 0, "bucket": 0}
    path = str(tmp_path / "b0.ckpt")
    ray.get(w.checkpoint.remote(path, meta))

    w2 = SessionBucketWorker.remote(0)
    assert ray.get(w2.restore.remote(path, meta)) == 1  # same params: fine
    w3 = SessionBucketWorker.remote(0)
    bad = dict(meta, chunk_rows=32)
    with pytest.raises(Exception) as ei:
        ray.get(w3.restore.remote(path, bad))
    assert "feed parameters" in str(ei.value)
