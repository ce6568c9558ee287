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
    for t in ["lineitem", "orders", "customer", "nation", "region", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _cmp(ds, sql):
    got = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
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


@pytest.mark.usefixtures("ray_session")
def test_ship_priority_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["ship_priority"](SF), entry.oracle_sql()["ship_priority"])


@pytest.mark.usefixtures("ray_session")
def test_revenue_delta_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["revenue_delta"](SF), entry.oracle_sql()["revenue_delta"])


@pytest.mark.usefixtures("ray_session")
def test_large_orders_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["large_orders"](SF), entry.oracle_sql()["large_orders"])


@pytest.mark.usefixtures("ray_session")
def test_ship_priority_tie_break_boundary():
    """Orders tied exactly at the k-boundary revenue: earlier order
    date wins, then smaller orderkey — at any block layout."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import ship_priority

    cut = int(pd.Timestamp("1997-06-01").value // 1000)
    after = pd.Timestamp("1997-07-01")
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": [100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_shipdate": pa.array([after] * 3),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            # order 3 placed earlier than 1 and 2 (which tie on date)
            "o_orderdate": pa.array(
                [
                    pd.Timestamp("1997-02-01"),
                    pd.Timestamp("1997-02-01"),
                    pd.Timestamp("1997-01-01"),
                ]
            ),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1], pa.int64()),
            "c_mktsegment": ["BUILDING"],
        }
    )
    out = ship_priority(
        rd.from_arrow(li).repartition(3),
        rd.from_arrow(orders),
        rd.from_arrow(cust),
        segment="BUILDING",
        cutoff_us=cut,
        k=2,
    ).to_pandas()
    # all revenues tie: date breaks first (order 3), then orderkey (1)
    assert sorted(out["orderkey"].tolist()) == [1, 3]


@pytest.mark.usefixtures("ray_session")
def test_ship_priority_segment_gate_and_shipped_excluded():
    """Customers outside the segment and lineitems already shipped at
    the cutoff contribute nothing."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import ship_priority

    cut = int(pd.Timestamp("1997-06-01").value // 1000)
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_extendedprice": [50.0, 70.0, 99.0],
            "l_discount": [0.0, 0.5, 0.0],
            # first line of order 1 shipped BEFORE the cutoff: excluded
            "l_shipdate": pa.array(
                [
                    pd.Timestamp("1997-01-01"),
                    pd.Timestamp("1997-08-01"),
                    pd.Timestamp("1997-08-01"),
                ]
            ),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array([pd.Timestamp("1997-03-01")] * 2),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        }
    )
    out = ship_priority(
        rd.from_arrow(li),
        rd.from_arrow(orders),
        rd.from_arrow(cust),
        segment="BUILDING",
        cutoff_us=cut,
        k=10,
    ).to_pandas()
    # order 2's customer is outside the segment; order 1 counts only
    # its unshipped 70.0 @ 50% line = 7000 cents * 50 = 350000 u4
    assert out["orderkey"].tolist() == [1]
    assert out["revenue_u4"].tolist() == [350_000]


@pytest.mark.usefixtures("ray_session")
def test_revenue_delta_empty_band_and_bounds():
    """Discount band inclusive on both ends, quantity strictly below;
    an empty band returns (0, 0) not NULL."""
    import ray.data as rd

    from ocr_lib_ray.functions.relational import revenue_delta

    lo = int(pd.Timestamp("1997-01-01").value // 1000)
    hi = int(pd.Timestamp("1998-01-01").value // 1000)
    li = pa.table(
        {
            "l_extendedprice": [100.0, 100.0, 100.0, 100.0],
            "l_discount": [0.05, 0.07, 0.08, 0.06],
            "l_quantity": [10.0, 23.0, 10.0, 24.0],
            "l_shipdate": pa.array([pd.Timestamp("1997-06-01")] * 4),
        }
    )
    out = revenue_delta(
        rd.from_arrow(li).repartition(2), lo, hi, 5, 7, 24
    )
    # rows 1 (5%) and 2 (7%) qualify; 8% is out of band, qty=24 is not <24
    assert out["n"].tolist() == [2]
    assert out["revenue_u4"].tolist() == [10_000 * 5 + 10_000 * 7]
    empty = revenue_delta(rd.from_arrow(li), lo, hi, 1, 2, 5)
    assert empty["revenue_u4"].tolist() == [0] and empty["n"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_matches_duckdb():
    import __ray_entry__ as entry

    _cmp(entry.queries()["promo_revenue"](SF), entry.oracle_sql()["promo_revenue"])


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_hand_counts_and_empty_window():
    import ray.data as rd

    from ocr_lib_ray.functions.relational import promo_revenue

    li = pa.table(
        {
            "l_partkey": pa.array([1, 2, 1], pa.int64()),
            "l_extendedprice": [100.0, 50.0, 100.0],
            "l_discount": [0.0, 0.0, 0.5],
            "l_shipdate": pa.array([pd.Timestamp("1997-03-01")] * 3),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": ["PROMO SHINY", "STANDARD DULL"],
        }
    )
    lo = int(pd.Timestamp("1997-01-01").value // 1000)
    hi = int(pd.Timestamp("1998-01-01").value // 1000)
    out = promo_revenue(
        rd.from_arrow(li).repartition(2), rd.from_arrow(part), lo, hi
    )
    # part 1 revenue: 100*100% + 100*50% = 1_000_000 + 500_000 u4 (promo)
    # part 2 revenue: 50*100% = 500_000 u4
    assert out["promo_u4"].tolist() == [1_500_000]
    assert out["total_u4"].tolist() == [2_000_000]
    assert out["promo_micro"].tolist() == [750_000]
    empty = promo_revenue(
        rd.from_arrow(li),
        rd.from_arrow(part),
        int(pd.Timestamp("2050-01-01").value // 1000),
        int(pd.Timestamp("2051-01-01").value // 1000),
    )
    assert empty["promo_micro"].tolist() == [0]
    assert empty["total_u4"].tolist() == [0]
