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
