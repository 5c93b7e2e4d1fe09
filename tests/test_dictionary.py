"""Dictionary inference from DataFrames (the NerByDataset lifecycle:
examples/.../NerByDataset/Program.cs:87-115 loads dataset rows into
column gazetteers; NliPivotTable infers datatypes from dimension names,
QueryParser.cs:122-200)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from nlquery_spark.operators.dictionary import spec_from_dataframe
from nlquery_spark.operators.nlsql import nl_filter, parse_conditions


@pytest.fixture(scope="module")
def orders_spec(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return spec_from_dataframe(
        orders,
        "orders",
        value_columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        caption_overrides={
            "o_totalprice": "total price",
            "o_orderstatus": "order status",
            "o_orderdate": "order date",
        },
    )


def test_datatype_inference(orders_spec):
    by_name = {c["name"]: c for c in orders_spec["columns"]}
    assert by_name["o_orderstatus"]["datatype"] == "string"
    assert by_name["o_totalprice"]["datatype"] == "number"
    # date by name suffix (QueryParser.cs:122-200) and/or Spark type
    assert by_name["o_orderdate"]["datatype"] == "date"


def test_gazetteer_values_distinct_sorted_capped(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = spec_from_dataframe(
        orders, "orders", value_columns=["o_orderstatus"], max_values=2
    )
    (col,) = spec["columns"]
    assert col["values"] == ["F", "O"]  # sorted distinct, capped at 2

    full = spec_from_dataframe(orders, "orders", value_columns=["o_orderstatus"])
    (col,) = full["columns"]
    assert col["values"] == sorted(set(col["values"]))
    expected = sorted(
        r[0] for r in orders.select("o_orderstatus").distinct().collect()
    )
    assert col["values"] == expected


def test_numeric_columns_have_no_gazetteer(orders_spec):
    by_name = {c["name"]: c for c in orders_spec["columns"]}
    assert "values" not in by_name["o_totalprice"]
    assert "values" not in by_name["o_orderdate"]


def test_caption_default_derivation(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    spec = spec_from_dataframe(part, "part", value_columns=["p_brand"])
    assert spec["columns"][0]["caption"] == "p brand"
    assert spec["caption"] == "part"


def test_inferred_spec_drives_nl_filter(spark, sf_dir, orders_spec):
    """NerByDataset end-to-end: dataset -> gazetteer -> NL query."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    conds = parse_conditions("orders with order status F", [orders_spec], em.NL_OPTIONS)
    assert len(conds) == 1 and conds[0].column.name == "o_orderstatus"
    assert conds[0].matched_value == "F"

    got = nl_filter(orders, "orders with order status F", [orders_spec], em.NL_OPTIONS)
    expected = orders.filter(F.col("o_orderstatus") == "F")
    assert got.count() == expected.count() > 0


def test_inferred_spec_number_comparison(spark, sf_dir, orders_spec):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = nl_filter(
        orders,
        "orders with total price more than 150000",
        [orders_spec],
        em.NL_OPTIONS,
    )
    assert got.count() == orders.filter(F.col("o_totalprice") > 150000).count()


def test_capped_value_pairs_two_level_exact_and_parallel(spark):
    """The bounded top-k keeps exactly the max_values smallest distinct
    values per column (same result as a global sort cap), and the plan's
    FIRST window is salt-partitioned — no single-reducer stage sees the
    unbounded distinct-value set."""
    from nlquery_spark.operators.dictionary import capped_value_pairs

    rows = [(f"v{i:03d}", f"w{(i * 7) % 150:03d}") for i in range(300)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = capped_value_pairs(df, ["a", "b"], max_values=40)
    out = {}
    for r in got.collect():
        out.setdefault(r.col_name, []).append(r.value)
    assert sorted(out["a"]) == sorted({v for v, _ in rows})[:40]
    assert sorted(out["b"]) == sorted({w for _, w in rows})[:40]
    # plan shape: two windows; the one that runs first (deeper in the
    # tree, i.e. LAST in explain output) partitions by (col_name, _salt)
    plan = got._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "RunningWindowFunction" in ln]
    assert len(windows) >= 2, plan
    first_window = windows[-1]
    assert "_salt" in first_window, first_window
    assert "_salt" not in windows[0], windows[0]
