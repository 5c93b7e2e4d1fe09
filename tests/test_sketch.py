"""CMS heavy hitters: exactness (sketch prunes, verify confirms)."""

from pyspark.sql import functions as F

from nlquery_spark.operators.sketch import heavy_hitters


def _tokens(spark, sf_dir):
    import __spark_entry__ as em

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return em._doc_tokens(docs).select("token")


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    threshold = 200
    got = {r.token: r.n for r in heavy_hitters(toks, threshold=threshold).collect()}
    exact = {
        r.token: r.n
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .collect()
    }
    assert got == exact and exact  # EXACT equality: sketch never drops a hitter


def test_heavy_hitters_tight_sketch_still_exact(spark, sf_dir):
    # deliberately coarse sketch (high eps -> heavy collisions): more
    # false candidates, but verification still yields the exact set
    toks = _tokens(spark, sf_dir)
    got = {r.token: r.n for r in heavy_hitters(toks, threshold=300, eps=0.05).collect()}
    exact = {
        r.token: r.n
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 300)
        .collect()
    }
    assert got == exact
