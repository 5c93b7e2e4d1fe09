"""Column-function package: JVM-side text + vector helpers."""

import math

import pytest
from pyspark.sql import functions as F

from nlquery_spark.functions import cosine, dot, l2_norm, token_count, tokens


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            (2, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
            (3, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
            (4, [0.5, 0.5, 0.0], [0.5, 0.5, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )


def test_dot_and_norm(vec_df):
    rows = {r.id: r for r in vec_df.select(
        "id", dot(F.col("a"), F.col("b")).alias("d"), l2_norm(F.col("a")).alias("n")
    ).collect()}
    assert rows[1].d == 0.0
    assert rows[2].d == pytest.approx(32.0)
    assert rows[2].n == pytest.approx(math.sqrt(14.0))
    assert rows[3].n == 0.0


def test_cosine_zero_norm_guard(vec_df):
    rows = {r.id: r.c for r in vec_df.select(
        "id", cosine(F.col("a"), F.col("b")).alias("c")
    ).collect()}
    assert rows[1] == 0.0  # orthogonal
    assert rows[3] == 0.0  # zero vector -> guard, not NaN
    assert rows[4] == pytest.approx(1.0)  # identical direction


def test_cosine_float_input_promoted_to_double(spark):
    # float32 storage must not change results vs double math
    f32 = spark.createDataFrame(
        [([0.1, 0.2], [0.1, 0.2])], "a array<float>, b array<float>"
    )
    (c,) = f32.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]
    assert c == pytest.approx(1.0, abs=1e-12)


def test_cosine_stays_in_codegen(vec_df):
    plan = vec_df.select(cosine(F.col("a"), F.col("b")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tokens_and_count(spark):
    df = spark.createDataFrame(
        [("hello  world",), ("",), ("   ",), ("one",)], "text string"
    )
    got = df.select(
        tokens(F.col("text")).alias("t"), token_count(F.col("text")).alias("n")
    ).collect()
    assert [r.t for r in got] == [["hello", "world"], [], [], ["one"]]
    assert [r.n for r in got] == [2, 0, 0, 1]


def test_subword_tokens_bpe_ish(spark):
    from nlquery_spark.functions.text import subword_count, subword_tokens

    df = spark.createDataFrame(
        [("It's a test-case with 42 tokens,  right?",), ("",), ("   ",)],
        "text string",
    )
    rows = df.select(
        subword_tokens(F.col("text")).alias("toks"),
        subword_count(F.col("text")).alias("n"),
    ).collect()
    assert rows[0].toks == [
        "It", "'s", " a", " test", "-", "case", " with", " 42",
        " tokens", ",", "  ", "right", "?",
    ]
    assert rows[0].n == 13
    assert rows[1].n == 0
    assert rows[2].toks == ["   "] and rows[2].n == 1
    # must stay in codegen: no Python eval in the plan
    plan = (
        df.select(subword_count(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
