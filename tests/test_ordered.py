"""ordered.py — per-key window analytics (rolling / lag / funnel) must
match DuckDB window functions bit-for-bit, stay invariant to bucket
count and block layout, and never leak a window across users."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_lib_ray.functions.ordered import funnel_stages, lag_intervals, rolling_stats


def _events_table(n=200, users=7, seed_mod=13):
    """Deterministic synthetic events: interleaved users, duplicate
    ts WITHIN a user (event_id breaks the tie), non-monotone arrival."""
    rows = []
    base = 1_700_000_000_000_000
    for i in range(n):
        u = (i * 7 + i // users) % users
        # ts deliberately collides for every 13th pair within a user
        ts = base + ((i * 37) % 101) * 60_000_000 + (0 if i % seed_mod else -1)
        rows.append(
            {
                "event_id": i,
                "user_id": u,
                "ts": ts,
                "event_type": ["view", "click", "purchase", "error"][i % 4],
                "value": round(((i * 17) % 997) / 7.0, 2),
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.column_names.index("ts"), "ts", t.column("ts").cast(pa.timestamp("us"))
    )


def _duck(sql: str, tbl: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", tbl)
    return con.execute(sql).df()


def _sorted(df: pd.DataFrame, by) -> pd.DataFrame:
    return df.sort_values(by).reset_index(drop=True).astype("int64")


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k", [1, 3, 5, 50])
def test_rolling_matches_duckdb_window(k):
    tbl = _events_table()
    got = _sorted(rolling_stats(rd.from_arrow(tbl), k=k).to_pandas(), "event_id")
    want = _sorted(
        _duck(
            f"""
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                              CAST(round(value * 100, 0) AS BIGINT) AS cents
                       FROM events)
            SELECT event_id, user_id, ts_us,
                   CAST(sum(cents) OVER w AS BIGINT) AS roll_sum_cents,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
            """,
            tbl,
        ),
        "event_id",
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


@pytest.mark.usefixtures("ray_session")
def test_rolling_bucket_and_block_invariance():
    tbl = _events_table()
    a = _sorted(
        rolling_stats(rd.from_arrow(tbl), k=4, num_buckets=2).to_pandas(), "event_id"
    )
    b = _sorted(
        rolling_stats(rd.from_arrow(tbl).repartition(11), k=4, num_buckets=64)
        .to_pandas(),
        "event_id",
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_rolling_never_crosses_users():
    # one user's events far apart in event_id order; k spans them all
    tbl = _events_table(n=40, users=2)
    got = rolling_stats(rd.from_arrow(tbl), k=40).to_pandas()
    df = tbl.to_pandas()
    df["cents"] = (df["value"] * 100).round().astype("int64")
    per_user = df.groupby("user_id")["cents"].sum()
    # the LAST event of each user (by ts, event_id) carries the full sum
    df["ts_us"] = df["ts"].astype("int64")
    last_ids = (
        df.sort_values(["ts_us", "event_id"]).groupby("user_id")["event_id"].last()
    )
    for u, eid in last_ids.items():
        row = got[got["event_id"] == eid].iloc[0]
        assert row["roll_sum_cents"] == per_user[u]
        assert row["roll_n"] == (df["user_id"] == u).sum()


@pytest.mark.usefixtures("ray_session")
def test_rolling_k_must_be_positive():
    tbl = _events_table(n=8)
    with pytest.raises(ValueError, match="k must be >= 1"):
        rolling_stats(rd.from_arrow(tbl), k=0)


@pytest.mark.usefixtures("ray_session")
def test_lag_matches_duckdb_and_first_is_minus_one():
    tbl = _events_table()
    got = _sorted(lag_intervals(rd.from_arrow(tbl)).to_pandas(), "event_id")
    want = _sorted(
        _duck(
            """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
            SELECT event_id, user_id, ts_us,
                   COALESCE(ts_us - lag(ts_us) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id), -1)
                   AS prev_gap_us
            FROM e
            """,
            tbl,
        ),
        "event_id",
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # every user has exactly one first event
    firsts = got[got["prev_gap_us"] == -1]
    assert sorted(firsts["user_id"]) == sorted(got["user_id"].unique())


@pytest.mark.usefixtures("ray_session")
def test_lag_duplicate_ts_breaks_tie_on_event_id():
    rows = [
        {"event_id": 2, "user_id": 1, "ts": 1000},
        {"event_id": 1, "user_id": 1, "ts": 1000},
        {"event_id": 3, "user_id": 1, "ts": 2000},
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(2, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = lag_intervals(rd.from_arrow(t)).to_pandas().set_index("event_id")
    assert got.loc[1, "prev_gap_us"] == -1
    assert got.loc[2, "prev_gap_us"] == 0  # same ts, later event_id
    assert got.loc[3, "prev_gap_us"] == 1000


@pytest.mark.usefixtures("ray_session")
def test_null_user_raises():
    t = pa.Table.from_pylist(
        [
            {"event_id": 1, "user_id": None, "ts": 1000},
            {"event_id": 2, "user_id": 5, "ts": 2000},
        ]
    )
    t = t.set_column(2, "ts", t.column("ts").cast(pa.timestamp("us")))
    with pytest.raises(Exception, match="null values in key column"):
        lag_intervals(rd.from_arrow(t)).materialize()


def _funnel_fixture():
    """Hand-built funnel corner cases (µs timestamps):
    user 1: view@10, click@20, purchase@30   -> full depth 3
    user 2: click@10, view@20, click@20      -> click NOT after view
                                                (tie at 20 blocked), depth 1
    user 3: view@10 only                     -> depth 1
    user 4: error@10 only                    -> depth 0, all -1
    user 5: purchase@5, view@10, click@15, purchase@20 -> early purchase
                                                ignored, depth 3
    """
    rows = [
        (1, 1, 10, "view"),
        (2, 1, 20, "click"),
        (3, 1, 30, "purchase"),
        (4, 2, 10, "click"),
        (5, 2, 20, "view"),
        (6, 2, 20, "click"),
        (7, 3, 10, "view"),
        (8, 4, 10, "error"),
        (9, 5, 5, "purchase"),
        (10, 5, 10, "view"),
        (11, 5, 15, "click"),
        (12, 5, 20, "purchase"),
    ]
    t = pa.Table.from_pylist(
        [
            {"event_id": e, "user_id": u, "ts": ts, "event_type": et}
            for e, u, ts, et in rows
        ]
    )
    return t.set_column(2, "ts", t.column("ts").cast(pa.timestamp("us")))


@pytest.mark.usefixtures("ray_session")
def test_funnel_sequential_semantics():
    got = (
        funnel_stages(rd.from_arrow(_funnel_fixture()))
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")
    )
    assert got.loc[1].tolist() == [10, 20, 30, 3]
    assert got.loc[2].tolist() == [20, -1, -1, 1]  # tie at 20 does not advance
    assert got.loc[3].tolist() == [10, -1, -1, 1]
    assert got.loc[4].tolist() == [-1, -1, -1, 0]
    assert got.loc[5].tolist() == [10, 15, 20, 3]  # pre-view purchase ignored
    assert list(got.columns) == ["s1_us", "s2_us", "s3_us", "depth"]


@pytest.mark.usefixtures("ray_session")
def test_funnel_bucket_invariance_and_all_users_present():
    tbl = _events_table(n=300, users=11)
    a = (
        funnel_stages(rd.from_arrow(tbl), num_buckets=1)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        funnel_stages(rd.from_arrow(tbl).repartition(7), num_buckets=64)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(a["user_id"]) == set(tbl.column("user_id").to_pylist())


# --- fill_windows (windows.py — tested here with the events helpers) --------


@pytest.mark.usefixtures("ray_session")
def test_fill_windows_emits_zero_rows_for_gaps():
    from ocr_lib_ray.functions.windows import fill_windows

    rows = [
        {"ts": 0, "value": 1.0},                     # window 0
        {"ts": 3 * 3600 * 1_000_000, "value": 2.5},  # window 3; 1-2 empty
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(0, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = (
        fill_windows(rd.from_arrow(t), window_seconds=3600)
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    assert len(got) == 4
    assert got["n"].tolist() == [1, 0, 0, 1]
    assert got["value_sum_cents"].tolist() == [100, 0, 0, 250]


@pytest.mark.usefixtures("ray_session")
def test_fill_windows_guard_on_degenerate_span():
    from ocr_lib_ray.functions.windows import fill_windows

    rows = [
        {"ts": 0, "value": 1.0},
        {"ts": 10_000 * 3600 * 1_000_000, "value": 1.0},
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(0, "ts", t.column("ts").cast(pa.timestamp("us")))
    with pytest.raises(Exception, match="max_windows"):
        fill_windows(rd.from_arrow(t), window_seconds=3600, max_windows=100)


@pytest.mark.usefixtures("ray_session")
def test_fill_windows_empty_input_returns_empty_typed():
    from ocr_lib_ray.functions.windows import fill_windows

    t = pa.Table.from_arrays(
        [pa.array([], pa.timestamp("us")), pa.array([], pa.float64())],
        names=["ts", "value"],
    )
    out = fill_windows(rd.from_arrow(t)).to_pandas()
    # 0 rows, no TypeError; Ray drops the schema of an all-empty
    # dataset in to_pandas, so only the row count is asserted (the
    # driver compare short-circuits both-empty results the same way)
    assert len(out) == 0


# --- sessionize_assign -------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_sessionize_assign_matches_duckdb():
    from ocr_lib_ray.functions.ordered import sessionize_assign

    tbl = _events_table()
    got = _sorted(
        sessionize_assign(rd.from_arrow(tbl), gap_seconds=1800).to_pandas(),
        "event_id",
    )
    want = _sorted(
        _duck(
            """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                       FROM events),
            x AS (SELECT event_id, user_id, ts_us,
                    CASE WHEN lag(ts_us) OVER w IS NULL
                           OR ts_us - lag(ts_us) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id
                                      ORDER BY ts_us, event_id))
            SELECT event_id, user_id, ts_us,
                   CAST(sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
            FROM x
            """,
            tbl,
        ),
        "event_id",
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


@pytest.mark.usefixtures("ray_session")
def test_sessionize_assign_gap_is_strict():
    # gap EXACTLY equal to the threshold does NOT break the session
    # (> semantics, same as windows.sessionize / the oracle)
    gap_us = 10 * 1_000_000
    rows = [
        {"event_id": 1, "user_id": 1, "ts": 0},
        {"event_id": 2, "user_id": 1, "ts": gap_us},          # == gap: same
        {"event_id": 3, "user_id": 1, "ts": 2 * gap_us + 1},  # > gap: new
        {"event_id": 4, "user_id": 2, "ts": 0},               # new user: 0
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(2, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = (
        sessionize_assign_import()(rd.from_arrow(t), gap_seconds=10)
        .to_pandas()
        .set_index("event_id")
    )
    assert got.loc[1, "session_id"] == 0
    assert got.loc[2, "session_id"] == 0
    assert got.loc[3, "session_id"] == 1
    assert got.loc[4, "session_id"] == 0


def sessionize_assign_import():
    from ocr_lib_ray.functions.ordered import sessionize_assign

    return sessionize_assign


@pytest.mark.usefixtures("ray_session")
def test_sessionize_assign_agrees_with_session_summaries():
    # collapsing labels to (user, session) summaries reproduces
    # windows.sessionize — the two ops are views of the same partition
    from ocr_lib_ray.functions.ordered import sessionize_assign
    from ocr_lib_ray.functions.windows import sessionize

    tbl = _events_table()
    labels = sessionize_assign(rd.from_arrow(tbl)).to_pandas()
    collapsed = (
        labels.groupby(["user_id", "session_id"])
        .agg(session_start_us=("ts_us", "min"), n_events=("ts_us", "size"))
        .reset_index()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
        .astype("int64")
    )
    summaries = (
        sessionize(rd.from_arrow(tbl))
        .to_pandas()[["user_id", "session_id", "session_start_us", "n_events"]]
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(collapsed, summaries)


# --- cohort_retention --------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_matches_duckdb():
    from ocr_lib_ray.functions.ordered import cohort_retention

    tbl = _events_table(n=400, users=13)
    got = _sorted(
        cohort_retention(rd.from_arrow(tbl), window_seconds=3600).to_pandas(),
        ["cohort_us", "window_us"],
    )
    want = _sorted(
        _duck(
            """
            WITH p AS (SELECT DISTINCT user_id,
                         (epoch_us(ts) // 3600000000) * 3600000000 AS window_us
                       FROM events),
            f AS (SELECT user_id, min(window_us) AS cohort_us FROM p GROUP BY 1)
            SELECT f.cohort_us, p.window_us,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM p JOIN f USING (user_id)
            GROUP BY 1, 2
            """,
            tbl,
        ),
        ["cohort_us", "window_us"],
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # diagonal sanity: every cohort is active in its own first window
    # with every one of its users
    cohort_sizes = want[want["cohort_us"] == want["window_us"]]
    assert cohort_sizes["n_users"].sum() == 13


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_block_invariance():
    from ocr_lib_ray.functions.ordered import cohort_retention

    tbl = _events_table(n=300, users=9)
    a = _sorted(
        cohort_retention(rd.from_arrow(tbl), window_seconds=3600).to_pandas(),
        ["cohort_us", "window_us"],
    )
    b = _sorted(
        cohort_retention(
            rd.from_arrow(tbl).repartition(13), window_seconds=3600
        ).to_pandas(),
        ["cohort_us", "window_us"],
    )
    pd.testing.assert_frame_equal(a, b)


# --- window_topk (windows.py — tested here with the events helpers) ----------


@pytest.mark.usefixtures("ray_session")
def test_window_topk_matches_duckdb():
    from ocr_lib_ray.functions.windows import window_topk

    tbl = _events_table(n=500, users=17)
    got = (
        window_topk(rd.from_arrow(tbl), window_seconds=3600, k=3)
        .to_pandas()
        .sort_values(["window_start_us", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _duck(
            """
            WITH c AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000
                              AS window_start_us,
                              event_type, count(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY window_start_us
                      ORDER BY n DESC, event_type ASC) AS rank
                  FROM c)
            SELECT window_start_us, event_type, CAST(n AS BIGINT) AS n,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3
            """,
            tbl,
        )
        .sort_values(["window_start_us", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


@pytest.mark.usefixtures("ray_session")
def test_window_topk_tie_break_deterministic():
    from ocr_lib_ray.functions.windows import window_topk

    # four types, all with count 2 in one window; k=3 must pick the 3
    # lexicographically-first types at rank 1..3
    rows = []
    eid = 0
    for et in ["delta", "alpha", "charlie", "bravo"]:
        for _ in range(2):
            rows.append({"event_id": eid, "user_id": 1, "ts": eid, "event_type": et,
                         "value": 0.0})
            eid += 1
    t = pa.Table.from_pylist(rows)
    t = t.set_column(2, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = (
        window_topk(rd.from_arrow(t), window_seconds=3600, k=3)
        .to_pandas()
        .sort_values("rank")
    )
    assert got["event_type"].tolist() == ["alpha", "bravo", "charlie"]
    assert got["rank"].tolist() == [1, 2, 3]
    assert got["n"].tolist() == [2, 2, 2]


@pytest.mark.usefixtures("ray_session")
def test_transition_counts_matches_duckdb_and_invariance():
    from ocr_lib_ray.functions.ordered import transition_counts

    tbl = _events_table()
    want = _duck(
        """
        WITH lagd AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev_type
            FROM events)
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM lagd WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
        """,
        tbl,
    )
    key = ["prev_type", "next_type"]
    a = (
        transition_counts(rd.from_arrow(tbl), num_buckets=2)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        transition_counts(rd.from_arrow(tbl).repartition(11), num_buckets=64)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    w = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, w, check_dtype=False)
    pd.testing.assert_frame_equal(a, b)
    # pair mass conservation: total transitions = rows - #users
    df = tbl.to_pandas()
    assert a["n"].sum() == len(df) - df["user_id"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_transition_counts_single_event_users_drop_out():
    from ocr_lib_ray.functions.ordered import transition_counts

    t = pa.Table.from_pylist(
        [
            {"event_id": 0, "user_id": 1, "ts": 0, "event_type": "view"},
            {"event_id": 1, "user_id": 2, "ts": 5, "event_type": "click"},
            {"event_id": 2, "user_id": 1, "ts": 9, "event_type": "click"},
        ]
    )
    t = t.set_column(
        t.column_names.index("ts"), "ts", t.column("ts").cast(pa.timestamp("us"))
    )
    got = transition_counts(rd.from_arrow(t)).to_pandas()
    # user 2 has one event -> contributes nothing; user 1: view->click
    assert got["prev_type"].tolist() == ["view"]
    assert got["next_type"].tolist() == ["click"]
    assert got["n"].tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_transition_counts_null_event_type_raises():
    from ocr_lib_ray.functions.ordered import transition_counts

    t = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([0, 1], pa.timestamp("us")),
            "event_type": pa.array(["view", None], pa.string()),
        }
    )
    with pytest.raises(Exception) as ei:
        transition_counts(rd.from_arrow(t)).to_pandas()
    assert "null event_type" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_ab_metrics_funnel_and_assignment_semantics():
    """Hand-built arms: conversion requires a purchase STRICTLY after
    the first view; unexposed purchasers never convert; assignment is
    the stable md5 hash (pinned against DuckDB in the edge gate)."""
    from ocr_lib_ray.functions.experiments import ab_metrics, _variant_of

    rows = [
        # user 10: view then purchase -> converts
        (0, 10, 0, "view"), (1, 10, 5, "purchase"),
        # user 11: purchase AT the first-view ts -> does NOT convert
        (2, 11, 0, "view"), (3, 11, 0, "purchase"),
        # user 12: purchase only, never exposed -> not exposed/converted
        (4, 12, 3, "purchase"),
        # user 13: view only
        (5, 13, 1, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = (
        ab_metrics(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("variant")
        .sort_index()
    )
    by_variant = {0: [0, 0, 0], 1: [0, 0, 0]}
    expect = {
        10: (True, True), 11: (True, False), 12: (False, False), 13: (True, False)
    }
    for u, (exposed, conv) in expect.items():
        v = _variant_of(u, "ab", 2)
        by_variant[v][0] += 1
        by_variant[v][1] += int(exposed)
        by_variant[v][2] += int(conv)
    for v, (nu, ne, nc) in by_variant.items():
        if nu == 0:
            assert v not in out.index
            continue
        assert out.loc[v, "n_users"] == nu
        assert out.loc[v, "n_exposed"] == ne
        assert out.loc[v, "n_converted"] == nc


@pytest.mark.usefixtures("ray_session")
def test_ab_metrics_null_ts_raises():
    from ocr_lib_ray.functions.experiments import ab_metrics

    t = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([None, 5_000_000], pa.timestamp("us")),
            "event_type": pa.array(["view", "purchase"], pa.string()),
        }
    )
    with pytest.raises(Exception) as ei:
        ab_metrics(rd.from_arrow(t)).to_pandas()
    assert "null ts" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_user_type_entropy_hand_checked():
    """Uniform 2-type user: H = ln 2, so h_micro_n = n*ln(n)micro -
    2*(n/2)*ln(n/2)micro; single-event and single-type users get 0."""
    import math

    from ocr_lib_ray.functions.windows import user_type_entropy

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 3, 3], pa.int64()),
            "event_type": pa.array(
                ["a", "a", "b", "b", "x", "y", "y"], pa.string()
            ),
        }
    )
    out = (
        user_type_entropy(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ln = lambda x: math.floor(math.log(float(x)) * 1e6 + 0.5)
    # user 1: n=4, two types with c=2 each
    assert out.loc[1, "h_micro_n"] == 4 * ln(4) - 2 * (2 * ln(2))
    assert out.loc[1, "n_types"] == 2
    # user 2: single event -> 0; user 3: single type -> n*ln(n)-n*ln(n)=0
    assert out.loc[2, "h_micro_n"] == 0
    assert out.loc[3, "h_micro_n"] == 3 * 0 if False else out.loc[3, "h_micro_n"] == 2 * ln(2) - 2 * ln(2)
    # implied entropy ~ ln 2 for user 1
    assert abs(out.loc[1, "h_micro_n"] / (4 * 1e6) - math.log(2)) < 1e-5
