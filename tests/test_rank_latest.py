"""ecdf_percent_rank / keep_latest: the sort-free window-function
rewrites must match DuckDB's percent_rank()/cume_dist()/row_number()
bit-for-bit — including ties, nulls-sort-last, single-row partitions,
and batch-layout invariance (the prune/broadcast stages must not make
the result depend on how rows landed in blocks)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest


def _duck(sql: str, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.execute(sql).df()


# --- ecdf_percent_rank ------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "vals",
    [
        [7],                                # single row: pr=0.0, cd=1.0
        [5, 3, 5, 1],                       # tie
        [2] * 9,                            # all equal
        [5, 3, None, 5, None, 1],           # nulls sort LAST
        [None, None],                       # all-null partition
        [(i * 13) % 40 for i in range(100)],
    ],
    ids=["one", "tie", "const", "nulls", "allnull", "mod40"],
)
def test_percent_rank_matches_duckdb(vals):
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import ecdf_percent_rank

    tbl = pa.Table.from_arrays(
        [pa.array(range(len(vals)), pa.int64()), pa.array(vals, pa.int64())],
        names=["id", "x"],
    )
    got = (
        ecdf_percent_rank(rd.from_arrow(tbl), "x")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _duck(
        """SELECT id, x,
                  percent_rank() OVER (ORDER BY x) AS pct_rank,
                  cume_dist()    OVER (ORDER BY x) AS cume_dist
           FROM t ORDER BY id""",
        t=tbl.to_pandas(),
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_grouped_matches_duckdb():
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import ecdf_percent_rank

    g = ["a"] * 20 + ["b"] * 7 + ["c"] + ["d"] * 3
    x = [(i * 7) % 5 for i in range(20)] + [9] * 7 + [42] + [None, 3, None]
    tbl = pa.Table.from_arrays(
        [
            pa.array(range(len(g)), pa.int64()),
            pa.array(g, pa.string()),
            pa.array(x, pa.int64()),
        ],
        names=["id", "lang", "x"],
    )
    # small target block size → several blocks → the broadcast CDF and
    # per-batch stamp are exercised across block layouts
    got = (
        ecdf_percent_rank(
            rd.from_arrow(tbl).repartition(5), "x", group_col="lang"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _duck(
        """SELECT id, lang, x,
                  percent_rank() OVER (PARTITION BY lang ORDER BY x) AS pct_rank,
                  cume_dist()    OVER (PARTITION BY lang ORDER BY x) AS cume_dist
           FROM t ORDER BY id""",
        t=tbl.to_pandas(),
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_guards():
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import ecdf_percent_rank

    tbl = pa.Table.from_arrays(
        [pa.array([1, 2, 3], pa.int64()), pa.array(["a", None, "b"], pa.string())],
        names=["x", "lang"],
    )
    with pytest.raises(Exception, match="null keys"):
        ecdf_percent_rank(
            rd.from_arrow(tbl), "x", group_col="lang"
        ).materialize()
    big = pa.Table.from_arrays(
        [pa.array(range(100), pa.int64())], names=["x"]
    )
    with pytest.raises(ValueError, match="max_distinct"):
        ecdf_percent_rank(rd.from_arrow(big), "x", max_distinct=10)


# --- keep_latest ------------------------------------------------------------


def _events_table():
    # keys with: a single version, many versions, a ts tie (id breaks
    # it), and cross-block duplication once repartitioned
    rows = [
        # (event_id, ts, user_id, payload)
        (1, 100, 7, "old"),
        (2, 300, 7, "newest"),
        (3, 200, 7, "mid"),
        (4, 50, 8, "only"),
        (5, 400, 9, "tie-lo-id"),   # ties with id 6 on ts → id 5 wins
        (6, 400, 9, "tie-hi-id"),
        (7, 10, 10, "a"),
        (8, 20, 10, "b"),
    ]
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.int64()),
            pa.array([r[2] for r in rows], pa.int64()),
            pa.array([r[3] for r in rows], pa.string()),
        ],
        names=["event_id", "ts", "user_id", "payload"],
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("nparts", [1, 4], ids=["one-block", "four-blocks"])
def test_keep_latest_matches_duckdb(nparts):
    import ray.data as rd

    from ocr_lib_ray.functions.versions import keep_latest

    tbl = _events_table()
    got = (
        keep_latest(
            rd.from_arrow(tbl).repartition(nparts),
            key_col="user_id",
            ts_col="ts",
            tie_col="event_id",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _duck(
        """SELECT event_id, ts, user_id, payload
           FROM (SELECT *, row_number() OVER (
                     PARTITION BY user_id ORDER BY ts DESC, event_id
                 ) AS rn FROM t)
           WHERE rn = 1 ORDER BY user_id""",
        t=tbl.to_pandas(),
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_keep_latest_null_and_missing_columns_raise():
    import ray.data as rd

    from ocr_lib_ray.functions.versions import keep_latest

    tbl = pa.Table.from_arrays(
        [
            pa.array([1, 2], pa.int64()),
            pa.array([10, None], pa.int64()),
            pa.array([1, 1], pa.int64()),
        ],
        names=["event_id", "ts", "user_id"],
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception, match="null values"):
        keep_latest(ds, "user_id", "ts", "event_id").materialize()
    with pytest.raises(ValueError, match="not in dataset schema"):
        keep_latest(ds, "user_id", "nope", "event_id")


@pytest.mark.usefixtures("ray_session")
def test_keep_latest_preserves_nullable_int64_payload():
    """Value columns must not round-trip through pandas: a nullable
    int64 payload would float, corrupting values >= 2^53 (regression —
    review finding)."""
    import ray.data as rd

    from ocr_lib_ray.functions.versions import keep_latest

    big = 2**53 + 1
    tbl = pa.Table.from_arrays(
        [
            pa.array([1, 2, 3], pa.int64()),
            pa.array([10, 20, 30], pa.int64()),
            pa.array([7, 7, 8], pa.int64()),
            pa.array([big, big + 2, None], pa.int64()),  # nullable payload
        ],
        names=["event_id", "ts", "user_id", "payload"],
    )
    out = pa.concat_tables(
        list(
            keep_latest(rd.from_arrow(tbl), "user_id", "ts", "event_id").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    # Arrow-side checks: .to_pandas() itself would float the nullable
    # int64 and mask exactly the corruption this test guards against
    assert out.schema.field("payload").type == pa.int64()
    vals = dict(zip(out["user_id"].to_pylist(), out["payload"].to_pylist()))
    assert vals[7] == big + 2  # exact, not 2^53-rounded
    assert vals[8] is None


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_int64_above_2_53_with_nulls():
    """Nulls in the column must not float the int64 values before
    searchsorted — 2^53 and 2^53+1 are distinct ranks (regression —
    review finding)."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import ecdf_percent_rank

    tbl = pa.Table.from_arrays(
        [
            pa.array([1, 2, 3], pa.int64()),
            pa.array([2**53, 2**53 + 1, None], pa.int64()),
        ],
        names=["id", "x"],
    )
    got = (
        ecdf_percent_rank(rd.from_arrow(tbl), "x")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # register the ARROW table: a pandas round-trip would float the
    # nullable int64 column and corrupt the oracle side too
    want = _duck(
        """SELECT id, x,
                  percent_rank() OVER (ORDER BY x) AS pct_rank,
                  cume_dist()    OVER (ORDER BY x) AS cume_dist
           FROM t ORDER BY id""",
        t=tbl,
    )
    assert got["pct_rank"].tolist() == want["pct_rank"].tolist()
    assert got["cume_dist"].tolist() == want["cume_dist"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_table_checksum_detects_any_change_and_ignores_layout():
    import ray.data as rd

    from ocr_lib_ray.functions.versions import table_checksum

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["aa", "bb", None],
        }
    )
    cols = ["doc_id", "text"]
    a = table_checksum(rd.from_arrow(t), cols)
    b = table_checksum(rd.from_arrow(t).repartition(3), cols)
    assert a.equals(b)  # layout-free
    # duplicate a row: an XOR fold would cancel; the modular sum shifts
    t2 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 3], pa.int64()),
            "text": ["aa", "bb", None, None],
        }
    )
    c = table_checksum(rd.from_arrow(t2), cols)
    assert c["n_rows"][0] == 4 and (
        c["ck1"][0] != a["ck1"][0] or c["ck2"][0] != a["ck2"][0]
    )
    # flip one byte: both sums move with overwhelming probability
    t3 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["aa", "bb", "x"],
        }
    )
    d = table_checksum(rd.from_arrow(t3), cols)
    assert d["ck1"][0] != a["ck1"][0] or d["ck2"][0] != a["ck2"][0]
    # empty table: typed zeros
    e = table_checksum(
        rd.from_arrow(t).filter(lambda r: False), cols
    )
    assert e["n_rows"][0] == 0 and e["ck1"][0] == 0 and e["ck2"][0] == 0


@pytest.mark.usefixtures("ray_session")
def test_table_checksum_zero_block_dataset():
    """limit(0) produces a ZERO-block dataset (aggregate returns None
    itself) — the empty side of a replication check reports zeros."""
    import ray.data as rd

    from ocr_lib_ray.functions.versions import table_checksum

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a"]})
    out = table_checksum(rd.from_arrow(t).limit(0), ["doc_id", "text"])
    assert out["n_rows"][0] == 0 and out["ck1"][0] == 0 and out["ck2"][0] == 0


@pytest.mark.usefixtures("ray_session")
def test_group_checksum_localizes_the_diverging_partition():
    import ray.data as rd

    from ocr_lib_ray.functions.versions import group_checksum

    t = pa.table(
        {
            "src": ["a", "a", "b"],
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["x", "y", "z"],
        }
    )
    t2 = pa.table(
        {
            "src": ["a", "a", "b"],
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["x", "y", "Z"],  # only partition b changed
        }
    )
    cols = ["doc_id", "text"]
    a = (
        group_checksum(rd.from_arrow(t).repartition(3), "src", cols)
        .to_pandas()
        .set_index("src")
        .sort_index()
    )
    b = group_checksum(rd.from_arrow(t2), "src", cols).to_pandas().set_index("src").sort_index()
    assert a.loc["a"].equals(b.loc["a"])  # untouched partition matches
    assert not a.loc["b"].equals(b.loc["b"])  # diverging one localized
