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


# ---------------------------------------------------------------------------
# Bloom filter (crawl-over-crawl constant-memory dedup)
# ---------------------------------------------------------------------------


def _ref_bitmap(texts, m_bits, k):
    """Pure-python reference build (no Ray, no sharding)."""
    from ocr_lib_ray.functions.sketches import bloom_positions

    bm = np.zeros(-(-m_bits // 8), dtype=np.uint8)
    for row in bloom_positions(texts, m_bits, k):
        for p in row:
            bm[p >> 3] |= 1 << (p & 7)
    return bm


def test_bloom_no_false_negatives():
    from ocr_lib_ray.functions.sketches import bloom_test

    texts = [f"doc body {i} words" for i in range(500)]
    bm = _ref_bitmap(texts, 1 << 16, 4)
    assert bloom_test(bm, texts, 1 << 16, 4).all()


def test_bloom_fpr_small_and_deterministic():
    """At 10 bits/key the FPR is ~1%; the hit set is identical run-to-run."""
    from ocr_lib_ray.functions.sketches import bloom_test

    member = [f"in {i}" for i in range(2000)]
    other = [f"out {i}" for i in range(5000)]
    bm = _ref_bitmap(member, 20_000, 4)
    hits1 = bloom_test(bm, other, 20_000, 4)
    hits2 = bloom_test(bm, other, 20_000, 4)
    assert (hits1 == hits2).all()
    assert hits1.mean() < 0.05, hits1.mean()


@pytest.mark.usefixtures("ray_session")
def test_bloom_build_matches_reference_any_sharding(sf_small):
    """Sharded distributed build == pure-python bitmap, for every
    (num_shards, override batch size) combination — bits are ORed, so
    partitioning must not matter."""
    import ray.data as rd

    from ocr_lib_ray.functions.sketches import bloom_build
    from ocr_lib_ray.functions.text_stats import normalize_expr

    tbl = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    texts = normalize_expr(tbl.column("text")).to_pylist()
    m = 1 << 16
    ref = np.zeros(len(bloom_build(rd.from_arrow(tbl.slice(0, 0)), m_bits=m, num_shards=4)), np.uint8)
    ref[: -(-m // 8)] = _ref_bitmap(texts, m, 4)[: len(ref)]
    for shards in (1, 4, 16):
        ds = rd.from_arrow(tbl).repartition(7)
        got = bloom_build(ds, m_bits=m, k=4, num_shards=shards)
        assert (got[: -(-m // 8)] == ref[: -(-m // 8)]).all(), shards


@pytest.mark.usefixtures("ray_session")
def test_bloom_filter_against_drops_prior(sf_small):
    """Docs of the prior corpus always drop (no false negatives e2e);
    survivors == the pure-python reference filter exactly."""
    import ray.data as rd

    from ocr_lib_ray.functions.sketches import (
        bloom_build,
        bloom_filter_against,
        bloom_test,
    )
    from ocr_lib_ray.functions.text_stats import normalize_expr

    tbl = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    prior_mask = [i % 2 == 0 for i in ids]
    prior = tbl.filter(np.array(prior_mask))
    m, k = 1 << 16, 4
    bm = bloom_build(rd.from_arrow(prior), m_bits=m, k=k, num_shards=4)
    out = bloom_filter_against(rd.from_arrow(tbl), bm, m_bits=m, k=k)
    got = sorted(r["doc_id"] for r in out.select_columns(["doc_id"]).take_all())
    texts = normalize_expr(tbl.column("text")).to_pylist()
    hits = bloom_test(bm, texts, m, k)
    want = sorted(i for i, h in zip(ids, hits) if not h)
    assert got == want
    assert not (set(got) & {i for i, p in zip(ids, prior_mask) if p})


@pytest.mark.usefixtures("ray_session")
def test_countmin_never_underestimates():
    """CMS property: est >= exact for every candidate (collisions only
    ADD); at default width the tiny vocabulary is collision-free so
    est == exact; at width 8 collisions appear but never undercount."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.sketches import countmin_estimate

    tbl = pa.Table.from_arrays(
        [
            pa.array(list(range(4)), pa.int64()),
            pa.array(
                [
                    "a b a c a",
                    "b c d d",
                    "",
                    "e a",
                ],
                pa.string(),
            ),
        ],
        names=["doc_id", "text"],
    )
    cands = ["a", "b", "d", "zzz"]
    wide = countmin_estimate(rd.from_arrow(tbl), cands).to_pandas().set_index("token")
    assert wide.loc["a", "exact_count"] == 4
    assert wide.loc["b", "exact_count"] == 2
    assert wide.loc["d", "exact_count"] == 2
    assert wide.loc["zzz", "exact_count"] == 0
    assert (wide["est_count"] == wide["exact_count"]).all()  # no collisions at w=2^14

    tight = (
        countmin_estimate(rd.from_arrow(tbl), cands, d=2, w=8)
        .to_pandas()
        .set_index("token")
    )
    assert (tight["est_count"] >= tight["exact_count"]).all()
