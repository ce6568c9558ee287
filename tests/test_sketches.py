"""HyperLogLog sketch tests: determinism, mergeability, accuracy vs
exact distinct, and the Ray aggregate end-to-end."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocr_lib_ray.functions.sketches import (
    DEFAULT_P,
    hll_estimate,
    hll_update,
)


def fresh(p=DEFAULT_P):
    return np.zeros(1 << p, dtype=np.uint8)


def test_hll_deterministic():
    a = hll_update(fresh(), [f"u{i}" for i in range(1000)])
    b = hll_update(fresh(), [f"u{i}" for i in range(1000)])
    assert (a == b).all()


def test_hll_accuracy():
    for n in (100, 5_000, 100_000):
        regs = hll_update(fresh(), range(n))
        est = hll_estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_mergeable():
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly."""
    a = hll_update(fresh(), range(0, 3000))
    b = hll_update(fresh(), range(2000, 6000))
    merged = np.maximum(a, b)
    direct = hll_update(fresh(), range(0, 6000))
    assert (merged == direct).all()


def test_hll_duplicates_dont_inflate():
    once = hll_update(fresh(), ["x", "y", "z"])
    many = hll_update(fresh(), ["x", "y", "z"] * 500)
    assert (once == many).all()


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_vs_exact(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.sketches import approx_distinct_users_per_type

    events = rd.read_parquet(f"{sf_small}/events.parquet", columns=["event_type", "user_id"])
    got = approx_distinct_users_per_type(events).to_pandas()
    df = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    exact = df.groupby("event_type")["user_id"].nunique()
    assert len(got) == len(exact)
    for _, row in got.iterrows():
        true = exact[row["event_type"]]
        assert abs(row["approx_distinct_users"] - true) / max(true, 1) < 0.05, (
            row["event_type"],
            row["approx_distinct_users"],
            true,
        )
