"""histogram_quantiles: distributed-histogram exact quantiles must match
DuckDB quantile_disc bit-for-bit across sizes, ties and q boundaries —
the index arithmetic (ceil of an IEEE product) is the part that can
silently diverge, so it is cross-checked directly here."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

QS = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


def duck_quantiles(vals, qs=QS):
    con = duckdb.connect()
    df = pd.DataFrame({"v": vals})  # noqa: F841 (registered by name)
    return con.execute(
        f"SELECT quantile_disc(v, {list(qs)}) FROM df"
    ).fetchone()[0]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "vals",
    [
        [7],
        [3, 1, 2],
        [0, 0, 0, 5],                      # heavy tie at the bottom
        list(range(10)),
        list(range(11)) + [5] * 7,         # tie in the middle
        [(i * 13) % 40 for i in range(100)],
        [2] * 50,                          # all equal
    ],
    ids=["one", "three", "tie0", "ten", "tiemid", "mod40", "const"],
)
def test_histogram_quantiles_match_duckdb(vals):
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import histogram_quantiles

    ds = rd.from_arrow(
        pa.Table.from_arrays([pa.array(vals, pa.int64())], names=["n"])
    )
    out = histogram_quantiles(ds, "n", qs=QS)
    assert out.column("q").to_pylist() == list(QS)
    assert out.column("n").to_pylist() == duck_quantiles(vals)


@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_match_duckdb_per_group():
    """Fully distributed per-group histogram quantiles == DuckDB
    quantile_disc GROUP BY, including a tie-heavy group, a singleton
    group, and an all-null group (which must disappear)."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import group_quantiles

    groups = ["a"] * 20 + ["b"] * 7 + ["c"] + ["d"] * 3
    vals = [(i * 7) % 5 for i in range(20)] + [9] * 7 + [42] + [None] * 3
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(groups, pa.string()), pa.array(vals, pa.int64())],
            names=["g", "v"],
        )
    )
    qs = (0.1, 0.5, 0.9, 1.0)
    out = (
        group_quantiles(ds, "g", "v", qs=qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    df = pd.DataFrame({"g": groups, "v": pd.array(vals, dtype="Int64")})  # noqa: F841
    want = con.execute(
        f"""SELECT g, unnest({list(qs)}) AS q,
                   unnest(quantile_disc(v, {list(qs)})) AS v
            FROM df WHERE v IS NOT NULL GROUP BY g ORDER BY g, q"""
    ).df()
    assert list(out["g"]) == list(want["g"])
    assert list(out["v"]) == list(want["v"])
    assert "d" not in set(out["g"])


@pytest.mark.usefixtures("ray_session")
def test_histogram_quantiles_nulls_empty_and_guard():
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import histogram_quantiles

    # nulls ignored (SQL aggregate semantics)
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([None, 4, None, 1, 3], pa.int64())], names=["n"]
        )
    )
    out = histogram_quantiles(ds, "n", qs=(0.5,))
    assert out.column("n").to_pylist() == duck_quantiles([4, 1, 3], (0.5,))

    # all-null → empty result, stable schema
    allnull = rd.from_arrow(
        pa.Table.from_arrays([pa.array([None, None], pa.int64())], names=["n"])
    )
    empty = histogram_quantiles(allnull, "n")
    assert empty.num_rows == 0
    assert empty.column_names == ["q", "n"]

    # distinct-domain guard raises instead of melting the driver
    wide = rd.from_arrow(
        pa.Table.from_arrays([pa.array(range(100), pa.int64())], names=["n"])
    )
    with pytest.raises(ValueError, match="max_distinct"):
        histogram_quantiles(wide, "n", max_distinct=10)

    # out-of-range q raises up front, not as an Arrow length mismatch
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        histogram_quantiles(wide, "n", qs=(0.5, 1.5))


@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_null_group_keys_raise():
    """Null GROUP keys raise loudly (SQL keeps a NULL group — silently
    dropping it would diverge from the oracle)."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import group_quantiles

    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(["a", None], pa.string()), pa.array([1, 2], pa.int64())],
            names=["g", "v"],
        )
    )
    with pytest.raises(Exception, match="null keys"):
        group_quantiles(ds, "g", "v").materialize()
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        group_quantiles(ds, "g", "v", qs=(-0.1,))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "vals",
    [
        [0.5],
        [3.25, 1.5, 2.75, 2.75, 9.0],
        [float(x % 7) / 3 for x in range(50)],
    ],
    ids=["one", "ties", "fifty"],
)
def test_sort_quantiles_match_duckdb(vals):
    """Sort-path quantiles == DuckDB quantile_disc on continuous
    float domains, including nulls dropped and multi-block layouts."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import sort_quantiles

    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(vals + [None], pa.float64())], names=["v"]
        )
    ).repartition(3)
    out = sort_quantiles(ds, "v", qs=QS)
    assert out.column("q").to_pylist() == list(QS)
    assert out.column("v").to_pylist() == duck_quantiles(vals)


@pytest.mark.usefixtures("ray_session")
def test_sort_quantiles_empty_and_qs_guard():
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import sort_quantiles

    allnull = rd.from_arrow(
        pa.Table.from_arrays([pa.array([None], pa.float64())], names=["v"])
    )
    empty = sort_quantiles(allnull, "v")
    assert empty.num_rows == 0
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sort_quantiles(allnull, "v", qs=(2.0,))


@pytest.mark.usefixtures("ray_session")
def test_quantile_band_filter_matches_duckdb_between():
    """[P10,P90] band == SQL BETWEEN over quantile_disc bounds; nulls
    never match; empty/all-null input yields zero rows."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import quantile_band_filter

    vals = [(i * 13) % 40 for i in range(100)]
    ds = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(range(100), pa.int64()), pa.array(vals, pa.int64())],
            names=["rid", "n"],
        )
    )
    lo, hi = duck_quantiles(vals, (0.1, 0.9))
    got = sorted(quantile_band_filter(ds, "n").to_pandas()["rid"])
    want = sorted(r for r, v in zip(range(100), vals) if lo <= v <= hi)
    assert got == want

    withnull = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([1, 2, 3], pa.int64()), pa.array([5, None, 5], pa.int64())],
            names=["rid", "n"],
        )
    )
    assert sorted(quantile_band_filter(withnull, "n").to_pandas()["rid"]) == [1, 3]

    allnull = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([1], pa.int64()), pa.array([None], pa.int64())],
            names=["rid", "n"],
        )
    )
    assert quantile_band_filter(allnull, "n").count() == 0

    with pytest.raises(ValueError, match="lo_q"):
        quantile_band_filter(ds, "n", lo_q=0.9, hi_q=0.1)


@pytest.mark.usefixtures("ray_session")
def test_quantized_quantiles_bounds_and_edges():
    """Grid-quantized quantiles: within one step of the exact
    (quantile_disc) answer, exact when values already sit on the grid,
    correct floor behavior on negatives, empty/null-only → empty, and
    the step guard raises."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import quantized_quantiles

    vals = [0.015, -1.237, 2.5, 2.5, 0.999, 7.32, -0.001, 3.111]
    ds = rd.from_arrow(
        pa.Table.from_arrays([pa.array(vals, pa.float64())], names=["v"])
    )
    qs = (0.1, 0.5, 0.9)
    out = quantized_quantiles(ds, "v", qs=qs, step=0.01)
    exact = duck_quantiles(vals, qs)
    for got, want in zip(out.column("v").to_pylist(), exact):
        assert want - 0.01 < got <= want  # lower grid edge, error < step

    on_grid = [0.25, 1.75, -3.5, 0.25]
    ds2 = rd.from_arrow(
        pa.Table.from_arrays([pa.array(on_grid, pa.float64())], names=["v"])
    )
    out2 = quantized_quantiles(ds2, "v", qs=qs, step=0.25)
    assert out2.column("v").to_pylist() == duck_quantiles(on_grid, qs)

    nulls = rd.from_arrow(
        pa.Table.from_arrays([pa.array([None, None], pa.float64())], names=["v"])
    )
    assert quantized_quantiles(nulls, "v", qs=qs).num_rows == 0

    with pytest.raises(ValueError, match="step"):
        quantized_quantiles(ds, "v", step=0.0)


@pytest.mark.usefixtures("ray_session")
def test_value_quantiles_oracle_empty_column_agreement():
    """The value_quantiles oracle must emit 0 rows (not 5 NULL-padded
    ones) on an all-null column, matching the op's empty-table contract
    (regression — review finding)."""
    import sys

    import duckdb
    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from ocr_lib_ray.functions.quantiles import quantized_quantiles

    tbl = pa.Table.from_arrays(
        [pa.array([None, None], pa.float64())], names=["value"]
    )
    assert quantized_quantiles(rd.from_arrow(tbl), "value", step=0.01).num_rows == 0
    con = duckdb.connect()
    con.register("events", tbl.to_pandas())
    assert len(con.execute(em.oracle_sql()["value_quantiles"]).df()) == 0
