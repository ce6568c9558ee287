"""TPC-H-shaped relational family: DuckDB equivalence on the sf0.001
fixture tables, broadcast-dim-join semantics, exact-integer money, and
top-k boundary tie-breaking."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _cmp(ds, sql):
    got = ds.to_pandas()
    want = _con().execute(sql).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if g[c].dtype != w[c].dtype:
            g[c] = g[c].astype("int64") if "int" in str(w[c].dtype) else g[c]
        w[c] = w[c].astype(g[c].dtype)
    pd.testing.assert_frame_equal(g, w)


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(
        entry.queries()["pricing_summary"](SF),
        entry.oracle_sql()["pricing_summary"],
    )


@pytest.mark.usefixtures("ray_session")
def test_star_revenue_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["star_revenue"](SF), entry.oracle_sql()["star_revenue"])


@pytest.mark.usefixtures("ray_session")
def test_top_customers_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["top_customers"](SF), entry.oracle_sql()["top_customers"])


@pytest.mark.usefixtures("ray_session")
def test_order_priority_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["order_priority"](SF), entry.oracle_sql()["order_priority"])


@pytest.mark.usefixtures("ray_session")
def test_broadcast_dim_join_inner_and_left():
    import ray.data as rd

    from ocr_lib_ray.functions.relational import broadcast_dim_join, make_dim_ref

    fact = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 2, 9], pa.int64()), "v": [10, 20, 30, 40, 50]})
    )
    dim = pa.table(
        {"k": pa.array([2, 1, 3], pa.int64()), "name": ["b", "a", "c"]}
    )
    ref = make_dim_ref(dim, "k", ["name"])

    inner = (
        broadcast_dim_join(fact, ref, "k", ["name"], how="inner")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert inner["k"].tolist() == [1, 2, 2, 3]
    assert inner["name"].tolist() == ["a", "b", "b", "c"]

    left = (
        broadcast_dim_join(fact, ref, "k", ["name"], how="left")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert len(left) == 5
    assert left.loc[left["k"] == 9, "name"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary_batch_size_invariance():
    """Integer partial sums commute: tiny blocks give the same bytes."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import pricing_summary

    cutoff = int(pd.Timestamp("2000-09-02").value // 1000)
    li = pq.read_table(f"{SF}/lineitem.parquet")
    a = pricing_summary(rd.from_arrow(li), cutoff).to_pandas()
    b = pricing_summary(
        rd.from_arrow(li).repartition(37), cutoff
    ).to_pandas()
    key = ["l_returnflag", "l_linestatus"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_empty_order_window_yields_zero_rows():
    """A date window containing no orders flows through the whole star
    join and aggregates to an empty result — not a crash."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import late_order_priority, star_revenue

    lo = int(pd.Timestamp("2050-01-01").value // 1000)
    hi = int(pd.Timestamp("2051-01-01").value // 1000)
    li = rd.from_arrow(pq.read_table(f"{SF}/lineitem.parquet"))
    orders = rd.from_arrow(pq.read_table(f"{SF}/orders.parquet"))
    cust = rd.from_arrow(pq.read_table(f"{SF}/customer.parquet"))
    nation = pq.read_table(f"{SF}/nation.parquet")
    region = pq.read_table(f"{SF}/region.parquet")
    out = star_revenue(li, orders, cust, nation, region, "ASIA", lo, hi).to_pandas()
    assert len(out) == 0
    out2 = late_order_priority(li, orders, lo, hi).to_pandas()
    assert len(out2) == 0


@pytest.mark.usefixtures("ray_session")
def test_top_customers_tie_break_boundary():
    """Two customers tied exactly at the k-boundary: the smaller custkey
    wins, deterministically, at any block layout."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import top_customers

    # 3 customers, all revenue equal; k=2 must keep custkeys 1 and 2
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": [100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_returnflag": ["R", "R", "R"],
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([3, 1, 2], pa.int64()),
            "o_orderdate": pa.array([pd.Timestamp("1996-08-01")] * 3),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": ["one", "two", "three"],
        }
    )
    lo = int(pd.Timestamp("1996-07-01").value // 1000)
    hi = int(pd.Timestamp("1997-07-01").value // 1000)
    out = top_customers(
        rd.from_arrow(li).repartition(3),
        rd.from_arrow(orders),
        rd.from_arrow(cust),
        lo,
        hi,
        k=2,
    ).to_pandas()
    assert sorted(out["custkey"].tolist()) == [1, 2]
