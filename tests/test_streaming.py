"""Streaming sessionize: incremental actor-state windows must equal the
batch groupby sessionize and emit closed sessions before end-of-log."""

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
    assert a.equals(b)  # bit-identical incl. float sums (same add order)


@pytest.mark.usefixtures("ray_session")
def test_streaming_incremental_emission():
    """Sessions close as the log advances — drainable before flush."""
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
