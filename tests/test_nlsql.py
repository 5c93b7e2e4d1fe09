"""NL -> SQL/aggregate compiler tests (the reference's NliDataFilter /
NlqForOlap lifecycles re-expressed on DataFrames)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from nlquery_spark.operators.nlsql import (
    nl_aggregate,
    nl_filter,
    parse_conditions,
    suggest_keywords,
)


def test_parse_conditions_comparison():
    conds = parse_conditions(
        "show orders with total price more than 150000", [em.ORDERS_TPCH_SPEC],
        em.NL_OPTIONS,
    )
    assert len(conds) == 1
    c = conds[0]
    assert c.column.name == "o_totalprice"
    from nlquery_spark.kernel.table import COND_GREATERTHAN

    assert c.condition == COND_GREATERTHAN
    from nlquery_spark.kernel.matches import NumberMatch

    assert isinstance(c.value, NumberMatch)
    assert float(c.value.value) == 150000.0


def test_nl_filter_matches_manual(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = nl_filter(
        orders,
        "orders with total price more than 150000",
        [em.ORDERS_TPCH_SPEC],
        em.NL_OPTIONS,
    )
    expected = orders.filter(F.col("o_totalprice") > 150000)
    assert got.count() == expected.count()
    assert got.count() > 0


def test_nl_aggregate_dims_and_measures(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = nl_aggregate(
        orders,
        "total price by order status",
        [em.ORDERS_TPCH_SPEC],
        measures={"o_totalprice": ("sum", "sum_total_price")},
        options_spec=em.NL_OPTIONS,
    )
    assert set(out.columns) == {"o_orderstatus", "sum_total_price"}
    manual = orders.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(10,2)"))
        .cast("double")
        .alias("sum_total_price")
    )
    got = {r.o_orderstatus: r.sum_total_price for r in out.collect()}
    exp = {r.o_orderstatus: r.sum_total_price for r in manual.collect()}
    assert got == exp


def test_nl_aggregate_with_filter(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = nl_aggregate(
        orders,
        "total price by order status with total price more than 100000",
        [em.ORDERS_TPCH_SPEC],
        measures={"o_totalprice": ("sum", "sum_total_price")},
        options_spec=em.NL_OPTIONS,
    )
    manual = (
        orders.filter(F.col("o_totalprice") > 100000)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(10,2)"))
            .cast("double")
            .alias("sum_total_price")
        )
    )
    got = {r.o_orderstatus: r.sum_total_price for r in out.collect()}
    exp = {r.o_orderstatus: r.sum_total_price for r in manual.collect()}
    assert got == exp


def test_suggest_keywords():
    # autocomplete over the Orders fixture dictionary
    from nlquery_spark.sources.pages import orders_schema_spec

    suggestions = suggest_keywords("Krus", [orders_schema_spec()])
    assert suggestions, "prefix should match the Krusovice gazetteer value"
    assert suggestions[0][0] == "Krusovice 0.5l"
    sugg2 = dict(suggest_keywords("cust", [orders_schema_spec()]))
    assert "Customer" in sugg2
