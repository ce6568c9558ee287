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


#: below this out-degree a source is never worth salting — replicating
#: its state row into every bucket would cost more than the skew saves
PAGERANK_HOT_MIN_DEGREE = 1024


def _hot_keys(
    ds, key_col: str, deg_col: str, n_edges: int, num_partitions: int, hot_degree_min
):
    """Detect hub keys whose edge rows would dominate one merge bucket
    of a join keyed on them: degree >= max(E / P, floor).  The
    collected set is BOUNDED by construction — at most E / threshold <=
    num_partitions keys can exceed E / P — so the driver-side take is
    hub-count-sized, never graph-sized."""
    import pyarrow.compute as pc

    thr = (
        int(hot_degree_min)
        if hot_degree_min is not None
        else max(n_edges // max(num_partitions, 1), PAGERANK_HOT_MIN_DEGREE)
    )
    if thr < 1:
        thr = 1
    rows = (
        ds.map_batches(
            lambda b, _t=thr: b.filter(pc.greater_equal(b.column(deg_col), _t)),
            batch_format="pyarrow",
        )
        .select_columns([key_col])
        .take_all()
    )
    return {int(r[key_col]) for r in rows}


def _hot_sources(outdeg_ds, n_edges: int, num_partitions: int, hot_degree_min):
    """PageRank view of :func:`_hot_keys` over the (n, outdeg) table."""
    return _hot_keys(
        outdeg_ds, "n", "outdeg", n_edges, num_partitions, hot_degree_min
    )


def pagerank_micro(
    edges_ds, iters: int = 3, num_partitions: int = 32, hot_degree_min=None
):
    """PageRank over DISTINCT directed edges (src, dst) — integer
    micro-unit spec in the module docstring.  Returns Dataset
    (node, rank_micro) after ``iters`` damped updates.

    Hub-skew hardening: sources whose out-degree exceeds
    max(E / num_partitions, ``hot_degree_min`` or
    :data:`PAGERANK_HOT_MIN_DEGREE`) are salted through the contribs
    join (``hash_join(replicate_keys=...)``) — their single state row
    replicates into every bucket while their edge rows spread
    uniformly, so a power-law hub cannot melt one merge task.  The
    output is bit-identical with or without salting (the join result
    SET is unchanged)."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    edges = _distinct_pairs(edges_ds).materialize()
    nodes = _distinct_nodes(edges)

    outdeg = edges.groupby("src").count().map_batches(
        lambda b: b.rename_columns(["n", "outdeg"]), batch_format="pyarrow"
    ).materialize()
    hot = _hot_sources(outdeg, edges.count(), num_partitions, hot_degree_min)

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
            replicate_keys=hot or None,
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
        import pyarrow.compute as pc

        cust = b.column("cust").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = b.column("supp").to_numpy(zero_copy_only=False).astype(np.int64)
        flag = (
            pc.equal(b.column("flag"), "R")
            .combine_chunks()
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
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
    from .joins import bucket_ints

    def add_bucket(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        bk = bucket_ints(np.asarray(ok).astype(np.int64), num_partitions)
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


def triangle_support(edges_ds, max_wedges: int = 50_000_000, num_partitions: int = 32):
    """Per-edge triangle support over an undirected graph given as
    DISTINCT (src, dst) with src < dst: each triangle is counted
    exactly once — at its minimum-(degree, id) apex — and attributed to
    the id-normalized pair (a, b), a < b, of its other two vertices.
    Returns (a, b, n_tri) for pairs with support >= 1 (sum(n_tri) =
    total triangle count; per-edge support is the k-truss building
    block).  On a regular graph (all degrees equal, e.g. K_n) the
    (degree, id) tie-break reduces to pure id orientation, so the
    counts coincide with the classic u < a < b attribution.

    Shape — DEGREE-ORDERED orientation (the Chiba–Nishizeki /
    Ortmann–Brandes discipline): each undirected edge is oriented from
    its lower-(degree, id) endpoint toward the higher, so per-apex
    out-degree is O(sqrt(E)) and total wedge volume is O(E^1.5) even on
    power-law (hub-skewed) graphs — a star graph generates ZERO wedges
    instead of C(hub_degree, 2).  Wedges are generated per apex inside
    HASH-BUCKET groups (bucket-first, never per-key dispatch),
    pre-counted per (a, b) inside the bucket, then matched against the
    edge set with a TAGGED UNION + one (a, b) groupby.  The two degree
    joins are themselves hub-salted (``replicate_keys``) so the hub's
    edge rows never funnel into one merge task.

    Guard, not a silent melt: the wedge volume Σ C(out-deg, 2) over the
    ORIENTED graph is pre-computed distributed and the op raises above
    ``max_wedges`` — dense graphs (the uniform fixture tables project
    to near-complete co-occurrence graphs; any exact algorithm is
    Θ(#triangles) there) must be thresholded/sampled upstream.
    """
    from ray.data.aggregate import Sum

    from .joins import bucket_ints, hash_join

    # one materialization: the edge table feeds the degree scan, the
    # orientation joins AND the closing union — without it each
    # consumer re-executes the construction lineage (rollup_stats)
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()

    # per-node UNDIRECTED degree: per-batch partials over src ∪ dst,
    # then one node-scale groupby
    def deg_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        u, c = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(c.astype(np.int64))],
            names=["node", "d_part"],
        )

    deg = (
        edges_ds.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d_part", alias_name="deg"))
        .materialize()
    )
    hot = _hot_keys(deg, "node", "deg", n_edges, num_partitions, None)

    deg_s = deg.map_batches(
        lambda b: b.rename_columns(["src", "deg_s"]), batch_format="pyarrow"
    )
    deg_d = deg.map_batches(
        lambda b: b.rename_columns(["dst", "deg_d"]), batch_format="pyarrow"
    )
    e1 = hash_join(
        edges_ds, deg_s, key_col="src", right_value_cols=["deg_s"],
        how="inner", suffix="", num_partitions=num_partitions,
        replicate_keys=hot or None,
    )
    e2 = hash_join(
        e1, deg_d, key_col="dst", right_value_cols=["deg_d"],
        how="inner", suffix="", num_partitions=num_partitions,
        replicate_keys=hot or None,
    )

    def orient(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        gs = b.column("deg_s").to_numpy(zero_copy_only=False).astype(np.int64)
        gd = b.column("deg_d").to_numpy(zero_copy_only=False).astype(np.int64)
        src_first = (gs < gd) | ((gs == gd) & (s < d))
        apex = np.where(src_first, s, d)
        other = np.where(src_first, d, s)
        return pa.Table.from_arrays(
            [pa.array(apex), pa.array(other)], names=["apex", "other"]
        )

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    # exact wedge bound from ORIENTED out-degrees: one count groupby,
    # per-batch partial Σ C(deg, 2), one scalar to the driver
    def degree_partial(b: pa.Table) -> pa.Table:
        c = b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([int((c * (c - 1) // 2).sum())])], names=["nw"]
        )

    n_wedges = (
        oriented.groupby("apex")
        .count()
        .map_batches(degree_partial, batch_format="pyarrow")
        .sum("nw")
        or 0
    )
    if n_wedges > max_wedges:
        raise ValueError(
            f"triangle_support: wedge volume {n_wedges} exceeds max_wedges="
            f"{max_wedges} — the graph is too dense even under the "
            "degree-ordered orientation; threshold/sample edges upstream"
        )

    def add_bucket(b: pa.Table) -> pa.Table:
        a = b.column("apex").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "bucket", pa.array(bucket_ints(a, num_partitions), pa.int32())
        )

    def wedges(g: pa.Table) -> pa.Table:
        # per-bucket: vectorized lexsort into apex segments, triangle
        # pair emission per apex (loop over APEXES, bounded by the
        # O(sqrt(E)) oriented out-degree, never over rows)
        a = g.column("apex").to_numpy(zero_copy_only=False).astype(np.int64)
        o = g.column("other").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((o, a))
        a, o = a[order], o[order]
        starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
        ends = np.concatenate([starts[1:], [len(a)]])
        As, Bs = [], []
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            nb = o[lo:hi]  # ascending by lexsort -> pairs come out a < b
            iu, iv = np.triu_indices(hi - lo, k=1)
            As.append(nb[iu])
            Bs.append(nb[iv])
        if not As:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["a", "b", "nw", "has_edge"],
            )
        pairs = np.stack([np.concatenate(As), np.concatenate(Bs)], axis=1)
        u, c = np.unique(pairs, axis=0, return_counts=True)
        return pa.Table.from_arrays(
            [
                pa.array(u[:, 0]),
                pa.array(u[:, 1]),
                pa.array(c.astype(np.int64)),
                pa.array(np.zeros(len(u), dtype=np.int64)),
            ],
            names=["a", "b", "nw", "has_edge"],
        )

    wedge_rows = (
        oriented.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pyarrow")
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
