"""operators/events.py: funnels, transition matrices, volume z-scores
against hand-computed fixtures."""

from datetime import datetime, timedelta

import pytest

from nlquery_spark.operators.events import (
    daily_volume_zscore,
    funnel_stages,
    retention_cohorts,
    type_transitions,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    # rows: (event_id, minutes_after_t0, user_id, event_type)
    return spark.createDataFrame(
        [(i, T0 + timedelta(minutes=m), u, t) for i, m, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_strict_ordering(spark):
    ev = _ev(
        spark,
        [
            # user 1 converts fully: view@0 -> click@5 -> purchase@10
            (1, 0, 1, "view"), (2, 5, 1, "click"), (3, 10, 1, "purchase"),
            # user 2: click BEFORE the first view -> stops at view
            (4, 5, 2, "click"), (5, 10, 2, "view"),
            # user 3: view + purchase but no click -> stops at view
            (6, 0, 3, "view"), (7, 10, 3, "purchase"),
            # user 4: never views -> not in the funnel at all
            (8, 0, 4, "purchase"),
            # user 5: purchase BETWEEN view and click doesn't count;
            # a later purchase does
            (9, 0, 5, "view"), (10, 2, 5, "purchase"),
            (11, 4, 5, "click"), (12, 6, 5, "purchase"),
        ],
    )
    rows = {
        r.stage: r for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert (rows[1].event_type, rows[1].users, rows[1].conversion) == ("view", 4, 1.0)
    assert (rows[2].event_type, rows[2].users) == ("click", 2)
    assert rows[2].conversion == pytest.approx(0.5)
    assert (rows[3].event_type, rows[3].users) == ("purchase", 2)
    assert rows[3].conversion == pytest.approx(1.0)


def test_funnel_within_seconds_bound(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1, "view"), (2, 2, 1, "click"),    # within 5 min
            (3, 0, 2, "view"), (4, 30, 2, "click"),   # too late
        ],
    )
    rows = {
        r.stage: r.users
        for r in funnel_stages(
            ev, ["view", "click"], within_seconds=300
        ).collect()
    }
    assert rows == {1: 2, 2: 1}


def test_funnel_equal_timestamp_not_counted(spark):
    # strict ordering: a click at EXACTLY the view timestamp is not
    # "after" it (mirrors the oracle's ts > t predicate)
    ev = _ev(spark, [(1, 0, 1, "view"), (2, 0, 1, "click")])
    rows = {r.stage: r.users for r in funnel_stages(ev, ["view", "click"]).collect()}
    assert rows == {1: 1, 2: 0}


def test_transitions_hand_computed(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1, "a"), (2, 1, 1, "b"), (3, 2, 1, "a"),   # a->b, b->a
            (4, 0, 2, "a"), (5, 1, 2, "b"),                   # a->b
            (6, 0, 3, "c"),                                   # no pair
        ],
    )
    got = {(r.src, r.dst): (r.n, r.prob) for r in type_transitions(ev).collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transitions_tie_broken_by_event_id(spark):
    # two events at the SAME timestamp: order_cols (event_id) decides,
    # so the result is deterministic, not partition-order dependent
    ev = _ev(spark, [(1, 0, 1, "a"), (2, 0, 1, "b"), (3, 1, 1, "c")])
    got = {(r.src, r.dst) for r in type_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_daily_zscore_hand_computed(spark):
    import statistics

    rows, eid = [], 0
    # type "x": 3 days with counts 1, 2, 3
    for day, n in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(n):
            rows.append((eid, day * 1440, 1, "x"))
            eid += 1
    # type "y": one day only -> stddev NULL -> zscore NULL
    rows.append((eid, 0, 1, "y"))
    ev = _ev(spark, rows)
    got = {
        (r.event_type, str(r.day)): (r.n, r.zscore)
        for r in daily_volume_zscore(ev).collect()
    }
    sd = statistics.stdev([1, 2, 3])
    assert got[("x", "2024-01-01")] == (1, pytest.approx(round((1 - 2) / sd, 6)))
    assert got[("x", "2024-01-02")] == (2, pytest.approx(0.0))
    assert got[("x", "2024-01-03")] == (3, pytest.approx(round((3 - 2) / sd, 6)))
    assert got[("y", "2024-01-01")] == (1, None)


def test_daily_zscore_constant_volume_null_not_nan(spark):
    # constant daily volume -> stddev 0 -> NULL, never NaN/Inf
    ev = _ev(spark, [(1, 0, 1, "x"), (2, 1440, 1, "x")])
    got = [r.zscore for r in daily_volume_zscore(ev).collect()]
    assert got == [None, None]


def test_funnel_empty_intermediate_stage_null_conversion(spark):
    # stage 2 empties: stage-3 conversion must be NULL (DuckDB x/0
    # semantics), not a DIVIDE_BY_ZERO error (ANSI) or NaN
    ev = _ev(spark, [(1, 0, 1, "view"), (2, 1, 1, "purchase")])
    rows = {
        r.stage: (r.users, r.conversion)
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert rows == {1: (1, 1.0), 2: (0, 0.0), 3: (0, None)}


def test_funnel_single_event_scan(spark, tmp_path):
    """One source scan: the type-prefiltered projection is checkpointed
    and every stage reads it — un-checkpointed, a k-stage funnel
    re-scanned the events k(k+1)/2 times (measured: 6 scans for 3
    stages before the fix)."""
    p = str(tmp_path / "ev.parquet")
    _ev(
        spark,
        [(1, 0, 1, "view"), (2, 5, 1, "click"), (3, 9, 1, "purchase")],
    ).write.parquet(p)
    ev = spark.read.parquet(p)
    plan = (
        funnel_stages(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" not in plan      # the one scan ran inside the
    assert "Scan ExistingRDD" in plan      # eager checkpoint job


def test_retention_cohorts_two_cohorts(spark):
    # cohort A (users 1,2) first seen week of Jan 1; user 2 returns the
    # next week. cohort B (user 3) first seen week of Jan 8.
    ev = _ev(
        spark,
        [
            (1, 0, 1, "view"),               # Mon Jan 1, week 2024-01-01
            (2, 60, 2, "click"),             # same week
            (3, 7 * 1440, 2, "view"),        # Mon Jan 8, week 2024-01-08
            (4, 8 * 1440, 3, "signup"),      # Tue Jan 9, week 2024-01-08
        ],
    )
    got = {
        (str(r.cohort_week), str(r.activity_week)): (r.users, r.retention)
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", "2024-01-01"): (2, 1.0),
        ("2024-01-01", "2024-01-08"): (1, 0.5),
        ("2024-01-08", "2024-01-08"): (1, 1.0),
    }
