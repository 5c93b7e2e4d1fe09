"""As-of join: semantics vs pandas merge_asof (independent reference)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nlquery_spark.operators.asof import asof_join


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    left_rows = [
        (int(rng.randint(0, 6)), int(t), f"L{i}")
        for i, t in enumerate(sorted(rng.randint(0, 1000, size=80)))
    ]
    right_rows = [
        (int(rng.randint(0, 6)), int(t), float(i))
        for i, t in enumerate(sorted(rng.randint(0, 1000, size=60)))
    ]
    # deterministic: unique (key, time) on the right
    seen = set()
    right_rows = [r for r in right_rows if not (r[:2] in seen or seen.add(r[:2]))]
    left = spark.createDataFrame(left_rows, "k long, lt long, lval string")
    right = spark.createDataFrame(right_rows, "k long, rt long, rval double")
    got = {
        (r.k, r.lt, r.lval): r.rval
        for r in asof_join(left, right, on="k", left_time="lt",
                           right_time="rt", right_cols=["rt", "rval"]).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["k", "lt", "lval"]).sort_values("lt")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "rval"]).sort_values("rt")
    ref = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k",
                        direction="backward", allow_exact_matches=True)
    assert len(got) == len(left_rows)
    for _, row in ref.iterrows():
        want = None if pd.isna(row["rval"]) else row["rval"]
        assert got[(row["k"], row["lt"], row["lval"])] == want, (row["k"], row["lt"])


def test_asof_exact_time_tie_matches(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k long, lt long, lval string")
    right = spark.createDataFrame([(1, 100, 7.0), (1, 99, 5.0)], "k long, rt long, rval double")
    r = asof_join(left, right, "k", "lt", "rt", ["rval"]).collect()[0]
    assert r.rval == 7.0  # <= semantics: same-instant right row matches


def test_asof_payload_name_collision_rejected(spark):
    # a payload column shadowing a left column would emit a duplicate
    # output name; asof_join must fail fast instead
    left = spark.createDataFrame([(1, 100, "a")], "k long, lt long, rval string")
    right = spark.createDataFrame([(1, 99, 5.0)], "k long, rt long, rval double")
    with pytest.raises(ValueError, match="rval"):
        asof_join(left, right, "k", "lt", "rt", ["rval"])


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], "k long, lt long, lval string")
    right = spark.createDataFrame([(1, 50, 1.0)], "k long, rt long, rval double")
    rows = {r.lval: r.rval for r in asof_join(left, right, "k", "lt", "rt", ["rval"]).collect()}
    assert rows == {"a": None, "b": None}


def test_range_join_matches_naive_cross_filter(spark):
    import numpy as np

    rng = np.random.RandomState(4)
    base = 1_700_000_000
    points = [
        (int(rng.randint(0, 5)), base + int(t), f"P{i}")
        for i, t in enumerate(rng.randint(0, 10 * 86400, size=120))
    ]
    intervals = [
        (int(rng.randint(0, 5)), base + int(s), base + int(s) + int(d), f"I{i}")
        for i, (s, d) in enumerate(
            zip(rng.randint(0, 9 * 86400, size=40), rng.randint(0, 3 * 86400, size=40))
        )
    ]
    from nlquery_spark.operators.asof import range_join

    p = spark.createDataFrame(points, "k long, pt long, pid string").select(
        "k", F.timestamp_seconds(F.col("pt")).alias("pt"), "pid"
    )
    iv = spark.createDataFrame(intervals, "k long, s long, e long, iid string").select(
        "k", F.timestamp_seconds(F.col("s")).alias("s"),
        F.timestamp_seconds(F.col("e")).alias("e"), "iid"
    )
    for bucket in ("1 day", "6 hours"):
        got = {
            (r.pid, r.iid)
            for r in range_join(p, iv, on="k", point_time="pt",
                                start_col="s", end_col="e", bucket=bucket).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in p.alias("p").join(
                iv.alias("i"),
                (F.col("p.k") == F.col("i.k"))
                & (F.col("p.pt") >= F.col("i.s"))
                & (F.col("p.pt") <= F.col("i.e")),
            ).collect()
        }
        assert got == naive and naive, bucket


def test_asof_nullable_payload_does_not_tear(spark):
    """Per-column fills would stitch values from DIFFERENT right rows
    when payload columns are nullable; the struct carry must return the
    single as-of row verbatim (nulls included)."""
    left = spark.createDataFrame([(1, 25, "x")], "k long, lt long, lval string")
    right = spark.createDataFrame(
        [(1, 10, 5.0, None), (1, 20, None, 7.0)],
        "k long, rt long, a double, b double",
    )
    r = asof_join(left, right, "k", "lt", "rt", ["rt", "a", "b"]).collect()[0]
    assert r.rt == 20 and r.a is None and r.b == 7.0


def test_asof_null_right_time_ignored(spark):
    left = spark.createDataFrame([(1, 25, "x")], "k long, lt long, lval string")
    right = spark.createDataFrame(
        [(1, None, 9.0), (1, 20, 7.0)], "k long, rt long, a double"
    )
    r = asof_join(left, right, "k", "lt", "rt", ["rt", "a"]).collect()[0]
    assert r.rt == 20 and r.a == 7.0


def test_range_join_shared_column_names(spark):
    # intervals sharing a non-key column name with points must not
    # crash the residual predicate (fully-qualified refs)
    from nlquery_spark.operators.asof import range_join

    p = spark.createDataFrame([(1, 100, "p1")], "k long, pt long, tag string").select(
        "k", F.timestamp_seconds("pt").alias("pt"), "tag"
    )
    iv = spark.createDataFrame(
        [(1, 50, 150, "i1")], "k long, s long, e long, tag string"
    ).select("k", F.timestamp_seconds("s").alias("s"),
             F.timestamp_seconds("e").alias("e"), "tag")
    rows = range_join(p, iv, on="k", point_time="pt", start_col="s", end_col="e").collect()
    assert len(rows) == 1 and rows[0].tag == "p1"  # points' column wins
