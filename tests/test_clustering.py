"""Integer k-means (SemDeDup clustering step): equivalence with a
pure-python reference, bit-identity across partitionings, and the
empty-cluster carry-forward rule."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_lib_ray.functions.clustering import (
    _assign,
    _rounded_mean,
    quantize_milli,
)


def ref_kmeans(vecs, k, iters, seed_ids):
    """Driver-side reference: same integer spec, no Ray."""
    q = np.floor(np.asarray(vecs, dtype=np.float64) * 1000.0 + 0.5).astype(np.int64)
    cent = q[np.asarray(seed_ids)].copy()
    for _ in range(iters):
        a = _assign(q, cent)
        for j in range(k):
            members = q[a == j]
            if len(members):
                cent[j] = _rounded_mean(members.sum(axis=0), len(members))
    return _assign(q, cent)


def emb_table(vecs):
    return pa.Table.from_arrays(
        [
            pa.array(range(len(vecs)), pa.int64()),
            pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )


def test_quantize_half_up_matches_floor_rule():
    col = pa.chunked_array([pa.array([[0.0005, -0.0005, 0.123456, -1.0]], pa.list_(pa.float32()))])
    q = quantize_milli(col)
    f32 = np.array([0.0005, -0.0005, 0.123456, -1.0], dtype=np.float32).astype(np.float64)
    assert (q[0] == np.floor(f32 * 1000.0 + 0.5)).all()


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_reference_any_partitioning(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import kmeans_milli

    tbl = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = tbl.column("embedding").to_pylist()
    want = ref_kmeans(vecs, k=8, iters=2, seed_ids=list(range(8)))
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = {r["vec_id"]: r["cluster"] for r in kmeans_milli(ds, k=8, iters=2).take_all()}
        got = np.array([out[i] for i in tbl.column("vec_id").to_pylist()])
        assert (got == want).all(), parts


@pytest.mark.usefixtures("ray_session")
def test_kmeans_duplicate_seed_empties_cluster():
    """Two identical seeds: ties assign everything to the lower cluster,
    the other cluster goes empty and must keep its centroid (COALESCE
    rule) instead of dividing by zero."""
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import kmeans_milli

    vecs = [[1.0, 0.0], [1.0, 0.0], [1.002, 0.0], [0.998, 0.0]]
    out = kmeans_milli(rd.from_arrow(emb_table(vecs)), k=2, iters=2).take_all()
    got = {r["vec_id"]: r["cluster"] for r in out}
    assert set(got.values()) == {0}
    want = ref_kmeans(vecs, k=2, iters=2, seed_ids=[0, 1])
    assert [got[i] for i in range(4)] == list(want)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_separated_blobs():
    """Two well-separated blobs land in two clusters regardless of the
    iteration count."""
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import kmeans_milli

    vecs = [[0.01 * i, 0.0] for i in range(5)] + [[10.0 + 0.01 * i, 0.0] for i in range(5)]
    out = kmeans_milli(rd.from_arrow(emb_table(vecs)), k=2, iters=3, seed_ids=[0, 5]).take_all()
    got = {r["vec_id"]: r["cluster"] for r in out}
    assert all(got[i] == 0 for i in range(5))
    assert all(got[i] == 1 for i in range(5, 10))


def ref_semantic_dedup(vecs, k, iters, seed_ids, num=16, den=100):
    """Driver-side reference for the full SemDeDup rule."""
    q = np.floor(np.asarray(vecs, dtype=np.float64) * 1000.0 + 0.5).astype(np.int64)
    cent = q[np.asarray(seed_ids)].copy()
    for _ in range(iters):
        a = _assign(q, cent)
        for j in range(k):
            m = q[a == j]
            if len(m):
                cent[j] = _rounded_mean(m.sum(axis=0), len(m))
    a = _assign(q, cent)
    keep = []
    for v in range(len(q)):
        dominated = False
        for u in range(v):
            if a[u] != a[v]:
                continue
            dot = int(q[u] @ q[v])
            if dot > 0 and dot * dot * den >= num * int(q[u] @ q[u]) * int(q[v] @ q[v]):
                dominated = True
                break
        if not dominated:
            keep.append((v, int(a[v])))
    return keep


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_matches_reference(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import semantic_dedup

    tbl = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = tbl.column("embedding").to_pylist()
    want = sorted(ref_semantic_dedup(vecs, k=8, iters=2, seed_ids=list(range(8))))
    for parts in (1, 5):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = sorted(
            (r["vec_id"], r["cluster"]) for r in semantic_dedup(ds, k=8, iters=2).take_all()
        )
        assert got == want, parts
    assert len(want) < len(vecs)  # the fixture's planted near-dups prune


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_drops_planted_duplicate():
    """An exact duplicate of an earlier vector always drops; the
    earlier copy and dissimilar vectors survive."""
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import semantic_dedup

    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [-1.0, 0.0]]
    out = semantic_dedup(rd.from_arrow(emb_table(vecs)), k=2, iters=1, seed_ids=[0, 1]).take_all()
    kept = sorted(r["vec_id"] for r in out)
    assert 2 not in kept  # duplicate of vec 0
    assert {0, 1, 3} <= set(kept)


def test_cosine_bounds_guard_raises_before_overflow():
    """High-dimension/high-magnitude quantized vectors must raise, not
    silently wrap int64 in the dominance test (review finding: d=256 at
    |milli|=2000 wraps dot^2 * den negative)."""
    from ocr_lib_ray.functions.clustering import _check_cosine_bounds

    ok = np.full((3, 64), 500, dtype=np.int64)
    _check_cosine_bounds(ok, 16, 100)  # fixture regime: fine
    bad = np.full((3, 256), 2000, dtype=np.int64)
    with pytest.raises(ValueError, match="overflow"):
        _check_cosine_bounds(bad, 16, 100)


@pytest.mark.usefixtures("ray_session")
def test_quantize_embeddings_roundtrip_error_bound():
    """SQ8 codes: within [0,255], constant dims code 0 with zero error,
    and reconstruction error is bounded by half a quantization step."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import quantize_embeddings

    vecs = [
        [0.0, 5.0, -1.0],
        [1.0, 5.0, 3.0],
        [0.5, 5.0, 1.0],
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    out = quantize_embeddings(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 9
    assert out["code"].between(0, 255).all()
    d2 = out[out["dim"] == 2]
    assert (d2["code"] == 0).all() and (d2["err_micro"] == 0).all()
    # half-step bound: span/255/2, in micro units (+1 for the floor)
    for dim, span in ((1, 1.0), (3, 4.0)):
        bound = span / 255 / 2 * 1e6 + 1
        assert (out[out["dim"] == dim]["err_micro"] <= bound).all()


@pytest.mark.usefixtures("ray_session")
def test_knn_sq8_recall_vs_brute():
    """Quantized ANN sanity: at 8 bits/dim the SQ8 top-5 recovers most
    of the exact brute top-5 on the fixture embeddings (recall floor
    0.8 — quantization noise may flip boundary ranks, never the bulk)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    brute = em.queries()["knn_brute"](sf).to_pandas()
    sq8 = em.queries()["knn_sq8"](sf).to_pandas()
    b = set(map(tuple, brute[["query_id", "vec_id"]].itertuples(index=False)))
    s = set(map(tuple, sq8[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(s) == len(b) == 50
    assert len(b & s) / len(b) >= 0.8


@pytest.mark.usefixtures("ray_session")
def test_pq_codebooks_match_per_subspace_kmeans():
    """A PQ codebook IS k per-subspace k-means runs: training each
    subspace independently with the scalar reference must give the
    same centroids, at any partitioning."""
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import pq_codebooks

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    ds = rd.from_arrow(emb_table(vecs)).repartition(5)
    cb = pq_codebooks(ds, m=2, k=3, iters=2)
    assert cb.shape == (2, 3, 4)
    q = np.floor(np.asarray(vecs, dtype=np.float64) * 1000.0 + 0.5).astype(np.int64)
    for j in range(2):
        sub = q[:, j * 4 : (j + 1) * 4]
        cent = sub[:3].copy()
        for _ in range(2):
            a = _assign(sub, cent)
            for c in range(3):
                members = sub[a == c]
                if len(members):
                    cent[c] = _rounded_mean(members.sum(axis=0), len(members))
        assert (cb[j] == cent).all()


@pytest.mark.usefixtures("ray_session")
def test_pq_codes_layout_invariance_and_err_consistency():
    import pandas as pd
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import pq_codes

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    a = (
        pq_codes(rd.from_arrow(emb_table(vecs)), m=4, k=4, iters=1)
        .to_pandas()
        .sort_values(["vec_id", "sub"])
        .reset_index(drop=True)
    )
    b = (
        pq_codes(rd.from_arrow(emb_table(vecs)).repartition(7), m=4, k=4, iters=1)
        .to_pandas()
        .sort_values(["vec_id", "sub"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["err_sq"] >= 0).all()
    assert a["err_sq"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_pq_dim_not_divisible_raises():
    import ray.data as rd

    from ocr_lib_ray.functions.clustering import pq_codebooks

    vecs = np.zeros((10, 6), dtype=np.float32)
    with pytest.raises(Exception) as ei:
        pq_codebooks(rd.from_arrow(emb_table(vecs)), m=4, k=3)
    assert "divisible" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_knn_pq_recall_vs_brute():
    """PQ-ADC sanity vs the EXACT L2 top-5 (same metric — the cosine
    brute is a different ranking and would conflate metric with
    compression).  The fixture embeddings are unstructured Gaussian,
    PQ's documented worst case (distances concentrate), so the floor
    is honest-low: 0.25 at 64-bit codes.  Reruns must be bit-equal."""
    import sys

    import pandas as pd
    import ray.data as rd  # noqa: F401

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    v = np.floor(
        np.asarray(t.column("embedding").to_pylist(), dtype=np.float64) * 1000.0
        + 0.5
    ).astype(np.int64)
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mask = ids >= 10
    db, dbids = v[mask], ids[mask]
    exact = set()
    for qi in range(10):
        d = ((db - v[ids == qi][0]) ** 2).sum(axis=1)
        for j in np.lexsort((dbids, d))[:5]:
            exact.add((qi, int(dbids[j])))
    pq1 = (
        em.queries()["knn_pq"](sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pq2 = (
        em.queries()["knn_pq"](sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pq1, pq2)
    p = set(map(tuple, pq1[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(p) == 50
    assert len(exact & p) / len(exact) >= 0.25


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_pq_determinism_probe_subset_and_recall():
    """IVF-PQ: bit-equal reruns; with nprobe == k_coarse the candidate
    set is the full corpus so results must equal plain residual-free
    scanning of every cell; and the driver query's nprobe=2 top-5
    still recovers a floor fraction of the exact L2 top-5."""
    import sys

    import pandas as pd
    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from ocr_lib_ray.functions.clustering import knn_ivf_pq

    sf = "/root/testdata/sf0.001"
    a = (
        em.queries()["knn_ivf_pq"](sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    b = (
        em.queries()["knn_ivf_pq"](sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50

    # layout invariance at full probe
    emb = rd.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full1 = (
        knn_ivf_pq(emb, query_ids=list(range(5)), k_nn=3, k_coarse=4, nprobe=4)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    full2 = (
        knn_ivf_pq(
            emb.repartition(9), query_ids=list(range(5)), k_nn=3, k_coarse=4, nprobe=4
        )
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full1, full2)

    # recall floor vs exact L2 (residual PQ at 64-bit codes, half the
    # cells scanned, unstructured Gaussian fixture -> honest-low 0.2)
    t = pq.read_table(f"{sf}/embeddings.parquet")
    v = np.floor(
        np.asarray(t.column("embedding").to_pylist(), dtype=np.float64) * 1000.0
        + 0.5
    ).astype(np.int64)
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mask = ids >= 10
    db, dbids = v[mask], ids[mask]
    exact = set()
    for qi in range(10):
        d = ((db - v[ids == qi][0]) ** 2).sum(axis=1)
        for j in np.lexsort((dbids, d))[:5]:
            exact.add((qi, int(dbids[j])))
    p = set(map(tuple, a[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(exact & p) / len(exact) >= 0.2
