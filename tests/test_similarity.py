"""Similarity search tests: brute-force exactness vs a numpy oracle,
LSH recall measurement, embedding near-dup pairs."""

import numpy as np
import pyarrow.parquet as pq
import pytest


def numpy_topk(sf_dir, query_ids, k):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qmask = np.isin(ids, query_ids)
    out = {}
    for qid, qv in zip(ids[qmask], m[qmask]):
        sims = qv @ m[~qmask].T
        cids = ids[~qmask]
        order = np.lexsort((cids, -sims))[:k]
        out[int(qid)] = set(int(c) for c in cids[order])
    return out


@pytest.mark.usefixtures("ray_session")
def test_knn_brute_exact(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.similarity import knn_brute

    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    got = knn_brute(emb, query_ids=list(range(10)), k=5).to_pandas()
    oracle = numpy_topk(sf_small, list(range(10)), 5)
    assert len(got) == 50
    for qid, grp in got.groupby("query_id"):
        assert set(grp["vec_id"]) == oracle[qid]


@pytest.mark.usefixtures("ray_session")
def test_knn_lsh_recall(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.similarity import knn_lsh

    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    got = knn_lsh(emb, query_ids=list(range(10)), k=5, n_planes=4, n_tables=4).to_pandas()
    oracle = numpy_topk(sf_small, list(range(10)), 5)
    hits = total = 0
    for qid, nb in oracle.items():
        found = set(got[got["query_id"] == qid]["vec_id"])
        hits += len(found & nb)
        total += len(nb)
    recall = hits / total
    # multi-table LSH: measured 0.94 on this fixture; floor with margin
    assert recall >= 0.6, recall


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_recall_and_determinism(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.similarity import knn_ivf

    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    got = knn_ivf(
        emb, query_ids=list(range(10)), k=5, n_centroids=16, nprobe=6
    ).to_pandas()
    oracle = numpy_topk(sf_small, list(range(10)), 5)
    hits = total = 0
    for qid, nb in oracle.items():
        found = set(got[got["query_id"] == qid]["vec_id"])
        hits += len(found & nb)
        total += len(nb)
    recall = hits / total
    assert recall >= 0.6, recall
    # nprobe == n_centroids scans everything → exact (== brute)
    exact = knn_ivf(
        emb, query_ids=list(range(10)), k=5, n_centroids=16, nprobe=16
    ).to_pandas()
    for qid, nb in oracle.items():
        assert set(exact[exact["query_id"] == qid]["vec_id"]) == nb
    # deterministic across runs (no RNG in the k-means)
    again = knn_ivf(
        emb, query_ids=list(range(10)), k=5, n_centroids=16, nprobe=6
    ).to_pandas()
    key = ["query_id", "vec_id"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_cosine_dup_pairs_match_numpy(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.similarity import cosine_dup_pairs

    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    got = cosine_dup_pairs(emb, threshold=0.4).to_pandas()
    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu, ju = np.triu_indices(len(ids), 1)
    want = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(iu[sims[iu, ju] >= 0.4], ju[sims[iu, ju] >= 0.4])
    }
    assert set(zip(got["d1"], got["d2"])) == want


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_embedding():
    """Planted eval leak drops (including an exact copy and a scaled
    copy — cosine is scale-invariant); orthogonal rows survive; empty
    eval set is a no-op; the max_eval_rows guard raises."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.similarity import decontaminate_embedding

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    corpus = pa.Table.from_arrays(
        [
            pa.array([1, 2, 3, 4], pa.int64()),
            pa.array(
                [
                    e1,                      # exact eval copy → drop
                    [2.0, 0.02, 0.0, 0.0],   # scaled near-copy → drop
                    e2,                      # orthogonal to eval → keep
                    [0.0, 0.1, 1.0, 0.0],    # far → keep
                ],
                pa.list_(pa.float64()),
            ),
        ],
        names=["vec_id", "embedding"],
    )
    evals = pa.Table.from_arrays(
        [pa.array([100], pa.int64()), pa.array([e1], pa.list_(pa.float64()))],
        names=["vec_id", "embedding"],
    )
    out = decontaminate_embedding(
        rd.from_arrow(corpus), rd.from_arrow(evals), threshold=0.9
    ).to_pandas()
    assert sorted(out["vec_id"]) == [3, 4]

    empty = rd.from_arrow(corpus.slice(0, 0))
    assert sorted(
        decontaminate_embedding(rd.from_arrow(corpus), empty).to_pandas()["vec_id"]
    ) == [1, 2, 3, 4]

    with pytest.raises(ValueError, match="max_eval_rows"):
        decontaminate_embedding(
            rd.from_arrow(corpus), rd.from_arrow(evals), max_eval_rows=0
        )
