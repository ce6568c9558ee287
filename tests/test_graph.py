"""PageRank (integer micro-units): equivalence with a driver-side
reference on the fixture purchase graph, partition invariance, and the
dangling-mass rule on a hand-built chain."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_lib_ray.functions.graph import BASE, DAMP_DEN, DAMP_NUM, R0


def ref_pagerank(edges, iters):
    """Pure-python reference of the exact integer spec."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {v: R0 for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if od.get(v, 0) == 0)
        share = dang // n
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // od[s]
        r = {v: BASE + (DAMP_NUM * (inc[v] + share)) // DAMP_DEN for v in nodes}
    return r


def edge_ds(edges):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array([s for s, _ in edges], pa.int64()),
                pa.array([d for _, d in edges], pa.int64()),
            ],
            names=["src", "dst"],
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_pagerank_dangling_chain():
    """0→1→2 with 2 dangling: ranks redistribute the dangling mass and
    match the reference bit-exactly."""
    from ocr_lib_ray.functions.graph import pagerank_micro

    edges = [(0, 1), (1, 2)]
    out = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(edge_ds(edges), iters=3, num_partitions=4).take_all()
    }
    assert out == ref_pagerank(edges, 3)
    assert out[2] > out[1] > out[0]  # downstream accumulates


@pytest.mark.usefixtures("ray_session")
def test_pagerank_duplicate_edges_ignored():
    """The operator dedups (src, dst) rows: a multiedge input equals the
    simple-graph input."""
    from ocr_lib_ray.functions.graph import pagerank_micro

    simple = [(0, 1), (1, 0), (1, 2)]
    multi = simple + [(0, 1)] * 5
    a = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(edge_ds(simple), iters=2, num_partitions=4).take_all()
    }
    b = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(edge_ds(multi), iters=2, num_partitions=4).take_all()
    }
    assert a == b == ref_pagerank(simple, 2)


@pytest.mark.usefixtures("ray_session")
def test_purchase_graph_matches_reference(sf_small):
    """Full fixture pipeline (orders ⋈ lineitem → cyclic graph → 2
    iterations) == driver reference, at two partition counts."""
    import ray.data as rd

    from ocr_lib_ray.functions.graph import pagerank_micro, purchase_graph_edges

    o = pd.read_parquet(f"{sf_small}/orders.parquet")[["o_orderkey", "o_custkey"]]
    l = pd.read_parquet(f"{sf_small}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey", "l_returnflag"]
    ]
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    fwd = set(zip(2 * j["o_custkey"], 2 * j["l_suppkey"] + 1))
    rj = j[j["l_returnflag"] == "R"]
    rev = set(zip(2 * rj["l_suppkey"] + 1, 2 * rj["o_custkey"]))
    want = ref_pagerank(sorted(fwd | rev), 2)

    for parts in (4, 8):
        orders = rd.read_parquet(
            f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        li = rd.read_parquet(
            f"{sf_small}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"],
        )
        edges = purchase_graph_edges(orders, li, num_partitions=parts)
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank_micro(edges, iters=2, num_partitions=parts).take_all()
        }
        assert got == want, parts
