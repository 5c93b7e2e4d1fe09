"""Entity canonicalization: connected components over surface-form
similarity (SURVEY.md §3.4 stage S5).

Pipeline: normalize surface forms -> blocking keys (normalized form +
first token) -> within-block char-trigram Jaccard edges -> iterative
hash-to-min connected components (pure DataFrame ops, lineage broken per
iteration via localCheckpoint).

Scale posture:
- blocking caps pair generation (``max_block_size`` drops degenerate
  blocks — the skew guard: a block like "the" would otherwise go
  quadratic); AQE skew-join splits residual hot blocks.
- CC iterations converge in O(component diameter); surface-form
  components are star-like (2-4 iterations). Each iteration is one
  shuffle on node id; hot components are bounded by block capping, and
  min-label aggregation is a hash-agg (map-side partial combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalize_form(col):
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def _trigrams(col):
    padded = F.concat(F.lit("  "), col, F.lit("  "))
    n = F.length(padded) - 2
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: F.substring(padded, i, 3)))


def similarity_edges(
    forms: DataFrame,
    form_col: str = "form",
    threshold: float = 0.6,
    max_block_size: int = 200,
) -> DataFrame:
    """(form_a, form_b, sim) edges between distinct surface forms.

    Blocks: full normalized form (catches case/punct variants) and first
    normalized token (catches suffix variants like 'Krusovice 0.5l').
    """
    f = (
        forms.select(F.col(form_col).alias("form"))
        .distinct()
        .withColumn("norm", normalize_form(F.col("form")))
        .filter(F.length("norm") > 0)
        .withColumn("first_tok", F.split(F.col("norm"), " ")[0])
        .withColumn("tri", _trigrams(F.col("norm")))
    )
    blocked = f.select(
        "form", "norm", "tri", F.explode(F.array("norm", "first_tok")).alias("block")
    ).distinct()
    # skew guard: cap block sizes
    w = Window.partitionBy("block").orderBy("form")
    blocked = (
        blocked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_block_size)
        .drop("_rn")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tri"), F.col("b.tri")))
    union = F.size(F.array_union(F.col("a.tri"), F.col("b.tri")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.form") < F.col("b.form")),
        )
        .select(
            F.col("a.form").alias("form_a"),
            F.col("b.form").alias("form_b"),
            F.round(inter.cast("double") / union, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "form",
    src_col: str = "form_a",
    dst_col: str = "form_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) via iterative hash-to-min label propagation.

    Pure DataFrame ops; per-iteration localCheckpoint breaks lineage so
    plans stay bounded. Converges when no label changes.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(node_col).alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("_old"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node").alias(node_col), F.col("label").alias("component"))


def canonical_mapping(
    forms: DataFrame,
    form_col: str = "form",
    threshold: float = 0.6,
    max_block_size: int = 200,
) -> DataFrame:
    """surface form -> canonical_id (the lexicographically-min form of its
    similarity component)."""
    edges = similarity_edges(forms, form_col, threshold, max_block_size)
    cc = connected_components(edges, forms, node_col=form_col)
    return cc.select(
        F.col(form_col), F.col("component").alias("canonical_id")
    )


def canonicalize_triples(
    triples: DataFrame,
    obj_col: str = "obj",
    threshold: float = 0.6,
) -> DataFrame:
    """Attach obj_canonical to a triples DataFrame (broadcast the mapping —
    distinct surface forms are dictionary-sized, not corpus-sized)."""
    mapping = canonical_mapping(
        triples.select(F.col(obj_col).alias("form")), "form", threshold
    )
    return triples.join(
        F.broadcast(mapping.withColumnRenamed("form", obj_col)),
        obj_col,
        "left",
    ).withColumn("obj_canonical", F.coalesce("canonical_id", F.col(obj_col))).drop(
        "canonical_id"
    )
