"""docs/MIGRATION.md executable guarantee: every ```python snippet in
the guide runs verbatim against the fixture tables, so the migration
examples cannot rot as the API evolves."""

import re

import pytest


@pytest.fixture(scope="module")
def doc_snippets():
    with open("docs/MIGRATION.md") as fh:
        text = fh.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert len(blocks) >= 7, "migration guide lost snippets"
    return blocks


def test_migration_snippets_run(spark, sf_dir, doc_snippets, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prefixes = spark.createDataFrame([("tot",), ("ord",)], "prefix string")
    from nlquery_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 40)
    env = {
        "spark": spark,
        "orders": orders,
        "prefixes": prefixes,
        "pages": pages,
        "workdir": str(tmp_path / "migpipe"),
    }
    for i, snippet in enumerate(doc_snippets):
        exec(compile(snippet, f"MIGRATION.md#snippet{i}", "exec"), env)
    # the snippets' outputs are real DataFrames with real rows
    assert env["filtered"].count() > 0          # snippets 2 and 5 rebind it
    assert env["agg"].count() > 0
    assert env["pivot"].count() > 0
    assert env["suggestions"].count() > 0
    assert env["triples"].count() > 0
    assert env["ctx"]["graph"].count() > 0      # 4-stage pipeline ran
