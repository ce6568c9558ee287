"""Link-graph ranking (training-data op): PageRank power iteration
over an edge table — the domain-rank quality-prior shape web-corpus
curation uses (host-graph centrality as a crawl-priority / quality
weight, e.g. the published Common Crawl host ranks).

Exactness: ranks live in integer MICRO-units (r0 = 1_000_000), the
per-edge share is ``r // outdeg``, the damped update is
``base + (d_num * (incoming + dangling // N)) // d_den`` — every
quantity a non-negative int64, every division a floor, so the result
is order-free, batch-size-free, and bit-equal to the unrolled-CTE SQL
oracle (DuckDB ``//`` truncates toward zero, which equals floor on the
non-negative domain; the engine never produces a negative rank).
Bound: per-node incoming mass <= total rank mass ~= N * 2.2e6, and the
left join back onto the node table round-trips ``inc`` through float64
(hash_join's how="left" dtype stabilization) — exactness therefore
requires incoming < 2^53, i.e. N up to ~4e9 nodes (the Common Crawl
host graph is ~1e8; a trillion-node graph would need an integer-safe
join variant).

Scale shape: one iteration = one bucketed hash-join of the static edge
table against the rank table (keyed by source), a Sum groupby of the
contributions (keyed by destination), and a left join back onto the
node table — the canonical distributed PageRank exchange; nothing is
collected on the driver except the two per-iteration scalars (dangling
mass, node count).  The rank state is ``materialize()``d per iteration
(object store, spills) — the standard iteration checkpoint that keeps
lineage from re-executing all previous rounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

R0 = 1_000_000
BASE = 150_000  # (1 - 0.85) * R0
DAMP_NUM = 85
DAMP_DEN = 100


def _distinct_pairs(pairs_ds):
    """DISTINCT (src, dst) rows: per-batch np.unique partial (cuts the
    shuffle to distinct-per-block), then one two-key groupby (Ray's
    default sort-shuffle partitioning — not num_partitions-clamped)."""

    def partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.Table.from_arrays(
            [pa.array(u[:, 0]), pa.array(u[:, 1])], names=["src", "dst"]
        )

    return (
        pairs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


def _distinct_nodes(edges_ds):
    """(n,) distinct over src ∪ dst — same partial-then-groupby shape."""

    def partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([pa.array(np.unique(np.concatenate([s, d])))], names=["n"])

    return (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n")
        .count()
        .select_columns(["n"])
    )


def pagerank_micro(edges_ds, iters: int = 3, num_partitions: int = 32):
    """PageRank over DISTINCT directed edges (src, dst) — integer
    micro-unit spec in the module docstring.  Returns Dataset
    (node, rank_micro) after ``iters`` damped updates."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    edges = _distinct_pairs(edges_ds).materialize()
    nodes = _distinct_nodes(edges)

    outdeg = edges.groupby("src").count().map_batches(
        lambda b: b.rename_columns(["n", "outdeg"]), batch_format="pyarrow"
    )

    state = hash_join(
        nodes, outdeg, key_col="n", right_value_cols=["outdeg"],
        how="left", suffix="", num_partitions=num_partitions,
    ).map_batches(
        # left-join misses are NaN float64 → dangling outdeg 0; seed r0
        lambda b: pa.Table.from_arrays(
            [
                b.column("n"),
                pa.array(np.full(b.num_rows, R0, dtype=np.int64)),
                pa.array(
                    np.nan_to_num(
                        b.column("outdeg").to_numpy(zero_copy_only=False).astype(np.float64),
                        nan=0.0,
                    ).astype(np.int64)
                ),
            ],
            names=["n", "r", "outdeg"],
        ),
        batch_format="pyarrow",
    ).materialize()

    n_nodes = state.count()
    if n_nodes == 0:
        return state.select_columns(["n", "r"]).map_batches(
            lambda b: b.rename_columns(["node", "rank_micro"]), batch_format="pyarrow"
        )

    for _ in range(iters):
        # dangling mass: tiny per-batch partials, reduced on the driver
        dang = sum(
            row["s"]
            for row in state.map_batches(
                lambda b: pa.Table.from_arrays(
                    [
                        pa.array(
                            [
                                int(
                                    b.column("r")
                                    .to_numpy(zero_copy_only=False)[
                                        b.column("outdeg").to_numpy(zero_copy_only=False) == 0
                                    ]
                                    .sum()
                                )
                            ],
                            pa.int64(),
                        )
                    ],
                    names=["s"],
                ),
                batch_format="pyarrow",
            ).take_all()
        )
        dang_share = dang // n_nodes

        srcs = state.map_batches(
            lambda b: b.rename_columns(["src", "r", "outdeg"]), batch_format="pyarrow"
        )
        contribs = hash_join(
            edges, srcs, key_col="src", right_value_cols=["r", "outdeg"],
            how="inner", suffix="", num_partitions=num_partitions,
        ).map_batches(
            lambda b: pa.Table.from_arrays(
                [
                    b.column("dst"),
                    pa.array(
                        b.column("r").to_numpy(zero_copy_only=False)
                        // b.column("outdeg").to_numpy(zero_copy_only=False)
                    ),
                ],
                names=["dst", "contrib"],
            ),
            batch_format="pyarrow",
        )
        # materialized: hash_join's schema guard would otherwise execute
        # this whole shuffle chain once and materialize() a second time
        incoming = (
            contribs.groupby("dst")
            .aggregate(Sum("contrib", alias_name="inc"))
            .map_batches(
                lambda b: b.rename_columns(["n", "inc"]), batch_format="pyarrow"
            )
            .materialize()
        )

        def update(b: pa.Table, _share=dang_share) -> pa.Table:
            inc = np.nan_to_num(
                b.column("inc").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            ).astype(np.int64)
            r = BASE + (DAMP_NUM * (inc + _share)) // DAMP_DEN
            return pa.Table.from_arrays(
                [b.column("n"), pa.array(r), b.column("outdeg")],
                names=["n", "r", "outdeg"],
            )

        # repartition: each bucketed groupby multiplies tiny blocks;
        # unclamped, the block count (and per-task scheduling cost)
        # compounds every iteration
        state = (
            hash_join(
                state.select_columns(["n", "outdeg"]), incoming,
                key_col="n", right_value_cols=["inc"],
                how="left", suffix="", num_partitions=num_partitions,
            )
            .map_batches(update, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    return state.select_columns(["n", "r"]).map_batches(
        lambda b: b.rename_columns(["node", "rank_micro"]), batch_format="pyarrow"
    )


def purchase_graph_edges(orders_ds, lineitem_ds, num_partitions: int = 32):
    """The fixture graph: customer → supplier edges for every purchase
    (orders ⋈ lineitem on orderkey), plus supplier → customer
    BACK-edges for returned items (l_returnflag = 'R') so the graph is
    cyclic and the power iteration is non-trivial.  Node ids are
    parity-namespaced (customer c → 2c, supplier s → 2s+1)."""
    from .joins import hash_join

    li = lineitem_ds.map_batches(
        lambda b: b.select(["l_orderkey", "l_suppkey", "l_returnflag"]).rename_columns(
            ["ok", "supp", "flag"]
        ),
        batch_format="pyarrow",
    )
    od = orders_ds.map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey"]).rename_columns(["ok", "cust"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, od, key_col="ok", right_value_cols=["cust"],
        how="inner", suffix="", num_partitions=num_partitions,
    )

    def to_edges(b: pa.Table) -> pa.Table:
        cust = b.column("cust").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = b.column("supp").to_numpy(zero_copy_only=False).astype(np.int64)
        flag = np.asarray(b.column("flag").to_pylist()) == "R"
        src = np.concatenate([2 * cust, (2 * supp + 1)[flag]])
        dst = np.concatenate([2 * supp + 1, (2 * cust)[flag]])
        return pa.Table.from_arrays([pa.array(src), pa.array(dst)], names=["src", "dst"])

    return joined.map_batches(to_edges, batch_format="pyarrow")


def cosupplier_edges(lineitem_ds, num_partitions: int = 32):
    """Undirected co-purchase edges between suppliers: (u, v), u < v,
    iff both supplied the same order — the co-occurrence-graph
    construction (SKUs bought together, hosts linked from the same
    page) on the fixture tables.

    The groupby keys on a HASH BUCKET of the order key, not the order
    itself (the sessionize_salted lesson: per-tiny-group Python
    dispatch dominates otherwise — measured 11 s vs ~4 s at sf0.01);
    orders are resolved vectorized inside the bucket and pair emission
    loops over ORDERS (small, bounded by order size), never rows.
    Deduped with the :func:`_distinct_pairs` partial-then-groupby."""
    import zlib

    def add_bucket(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        bk = [zlib.crc32(str(k).encode()) % num_partitions for k in ok]
        return pa.Table.from_arrays(
            [b.column("l_orderkey"), b.column("l_suppkey"),
             pa.array(bk, pa.int32())],
            names=["ok", "supp", "bucket"],
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        ok = g.column("ok").to_numpy(zero_copy_only=False)
        s = g.column("supp").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, ok))
        ok, s = ok[order], s[order]
        keep = np.ones(len(ok), dtype=bool)  # distinct (ok, supp)
        if len(ok) > 1:
            keep[1:] = (ok[1:] != ok[:-1]) | (s[1:] != s[:-1])
        ok, s = ok[keep], s[keep]
        starts = np.flatnonzero(
            np.concatenate([[True], ok[1:] != ok[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(ok)]])
        us, vs = [], []
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            iu, iv = np.triu_indices(hi - lo, k=1)
            us.append(s[lo:hi][iu])
            vs.append(s[lo:hi][iv])
        if not us:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["src", "dst"],
            )
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(us)), pa.array(np.concatenate(vs))],
            names=["src", "dst"],
        )

    pairs = (
        lineitem_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return _distinct_pairs(pairs)


def triangle_support(edges_ds, max_wedges: int = 50_000_000):
    """Per-edge triangle support over an undirected graph given as
    DISTINCT (src, dst) with src < dst: for every edge (a, b), the
    number of common neighbors u < a closing a triangle — i.e. each
    triangle {u < a < b} is counted exactly once, at its closing edge.
    Returns (a, b, n_tri) for edges with support >= 1 (sum(n_tri) =
    total triangle count; per-edge support is the k-truss building
    block).

    Shape: wedges (u→a, u→b) are generated per apex group (one
    map_groups over the smallest-id endpoint; id orientation makes
    every triangle a unique wedge + closing edge), pre-counted per
    (a, b) inside the group, then matched against the edge set with a
    TAGGED UNION + one (a, b) groupby — no join operator needed.

    Guard, not a silent melt: the wedge volume Σ C(outdeg, 2) is
    pre-computed DISTRIBUTED from the (materialized) edge table and the
    op raises above ``max_wedges`` — dense graphs (the uniform fixture
    tables project to near-complete co-occurrence graphs; any exact
    algorithm is Θ(#triangles) there) must be thresholded/sampled
    upstream, and real hub skew wants the degree-ordered orientation
    (orient toward higher degree — one extra degree join per endpoint,
    bounding wedges by O(E^1.5)).
    """
    from ray.data.aggregate import Sum

    # one materialization: the edge table feeds the guard scan, the
    # wedge generation AND the closing union — without it each consumer
    # re-executes the construction lineage (the rollup_stats lesson)
    edges_ds = edges_ds.materialize()

    # exact wedge bound from per-src out-degrees: one count groupby,
    # per-batch partial Σ C(deg, 2), one scalar to the driver
    def degree_partial(b: pa.Table) -> pa.Table:
        c = b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([int((c * (c - 1) // 2).sum())])], names=["nw"]
        )

    n_wedges = (
        edges_ds.groupby("src")
        .count()
        .map_batches(degree_partial, batch_format="pyarrow")
        .sum("nw")
        or 0
    )
    if n_wedges > max_wedges:
        raise ValueError(
            f"triangle_support: wedge volume {n_wedges} exceeds max_wedges="
            f"{max_wedges} — the graph is too dense for the id-oriented "
            "exact count; threshold/sample edges upstream or use the "
            "degree-ordered orientation"
        )

    def wedges(g: pa.Table) -> pa.Table:
        nbrs = np.sort(g.column("dst").to_numpy(zero_copy_only=False))
        if len(nbrs) < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["a", "b", "nw", "has_edge"],
            )
        iu, iv = np.triu_indices(len(nbrs), k=1)
        return pa.Table.from_arrays(
            [
                pa.array(nbrs[iu]),
                pa.array(nbrs[iv]),
                pa.array(np.ones(len(iu), dtype=np.int64)),
                pa.array(np.zeros(len(iu), dtype=np.int64)),
            ],
            names=["a", "b", "nw", "has_edge"],
        )

    wedge_rows = edges_ds.groupby("src").map_groups(
        wedges, batch_format="pyarrow"
    )

    def tag_edges(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_arrays(
            [
                b.column("src"),
                b.column("dst"),
                pa.array(np.zeros(n, dtype=np.int64)),
                pa.array(np.ones(n, dtype=np.int64)),
            ],
            names=["a", "b", "nw", "has_edge"],
        )

    tagged = wedge_rows.union(
        edges_ds.map_batches(tag_edges, batch_format="pyarrow")
    )
    agg = tagged.groupby(["a", "b"]).aggregate(
        Sum("nw", alias_name="nw"), Sum("has_edge", alias_name="has_edge")
    )

    def close(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.greater(b.column("has_edge"), 0), pc.greater(b.column("nw"), 0)
        )
        out = b.filter(keep)
        return pa.Table.from_arrays(
            [out.column("a"), out.column("b"),
             out.column("nw").cast(pa.int64())],
            names=["a", "b", "n_tri"],
        )

    return agg.map_batches(close, batch_format="pyarrow")
