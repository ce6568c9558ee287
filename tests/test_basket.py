"""copurchase_lift — market-basket pair support/lift: hand-checked
semantics, duplicate-line dedup, layout invariance, DuckDB equivalence
on the fixture, and the giant-order guard."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_lib_ray.functions.basket import copurchase_lift

SF = "/root/testdata/sf0.001"


def _li(rows):
    return rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
                "l_partkey": pa.array([p for _, p in rows], pa.int64()),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_copurchase_hand_checked_and_duplicate_lines_dedup():
    # order 1: parts {1,2,3}; order 2: {1,2} (part 1 twice -> once);
    # order 3: {3}.  n_orders=3.  pair (1,2): n_pair=2, n_1=2, n_2=2
    # -> lift = 2*3/(2*2) = 1.5; all other pairs support 1 -> pruned
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 1), (2, 2), (3, 3)]
    got = copurchase_lift(_li(rows), min_support=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"]) == (1, 2)
    assert r["n_pair"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["lift_micro"] == 1_500_000


@pytest.mark.usefixtures("ray_session")
def test_copurchase_matches_duckdb_and_layout_invariant():
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["copurchase_lift"])
        .df()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    got = (
        entry.queries()["copurchase_lift"](SF)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype("int64"))

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).repartition(17)
    again = (
        copurchase_lift(li, min_support=2)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, got)


@pytest.mark.usefixtures("ray_session")
def test_copurchase_giant_order_guard():
    rows = [(1, p) for p in range(40)]
    with pytest.raises(Exception) as ei:
        copurchase_lift(_li(rows), max_items_per_order=10).to_pandas()
    assert "max_items_per_order" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_copurchase_null_keys_raise():
    t = pa.table(
        {
            "l_orderkey": pa.array([1, None], pa.int64()),
            "l_partkey": pa.array([1, 2], pa.int64()),
        }
    )
    with pytest.raises(Exception) as ei:
        copurchase_lift(rd.from_arrow(t)).to_pandas()
    assert "null l_orderkey" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_copurchase_son_prune_bit_equal():
    """SON local prune (min_support > buckets so L > 1): output must be
    BIT-identical to the unpruned path, and a pair spread one-per-bucket
    below min_support must vanish from both."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.basket import copurchase_lift

    rows = []
    # pair (1, 2) in 6 orders -> frequent at min_support=6
    for ok in range(6):
        rows += [(ok, 1), (ok, 2)]
    # pair (3, 4) in 2 orders -> infrequent; locally ~1 per bucket
    rows += [(100, 3), (100, 4), (101, 3), (101, 4)]
    li = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    ds = rd.from_arrow(li).repartition(4)
    kw = dict(min_support=6, num_partitions=2)
    a = (
        copurchase_lift(ds, son_prune=True, **kw)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    b = (
        copurchase_lift(ds, son_prune=False, **kw)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(zip(a["part_a"], a["part_b"])) == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_copurchase_broadcast_and_join_annotation_bit_equal(monkeypatch):
    """Round-5 adaptive lift annotation: the broadcast path (default at
    catalog scale) and the hash-join fallback must be bit-equal."""
    import ocr_lib_ray.functions.basket as basket

    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
            "l_partkey": pa.array([10, 20, 30, 10, 20, 20, 30, 40], pa.int64()),
        }
    )
    ds = rd.from_arrow(li).repartition(3)
    a = (
        basket.copurchase_lift(ds, min_support=2)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(basket, "PART_COUNTS_BROADCAST_MAX", 0)
    b = (
        basket.copurchase_lift(ds, min_support=2)
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(zip(a["part_a"], a["part_b"])) == {(10, 20), (20, 30)}
