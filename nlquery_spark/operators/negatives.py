"""Negative sampling for KG-embedding training (TransE/DistMult-style):
for every positive edge, emit a corrupted edge whose entity is drawn
pseudo-randomly from the entity universe — deterministic, portable, and
fully distributed.

Two building blocks:

- ``dense_index``: a 0..n-1 dense index over a dimension WITHOUT a
  single-reducer global sort: entities are salted by a PORTABLE md5-
  derived salt (so an external engine can reproduce the index), each
  salt partition gets a local row_number, and salt offsets (a
  salt-count running sum — n_salts rows, trivially small) lift local
  ranks to global ids. Index order is salt-major, which is irrelevant
  for sampling (any fixed bijection works) but exactly reproducible.
- ``negative_samples``: draw = md5_u64(salt ':' edge_id) mod n; if the
  draw hits the edge's true entity it shifts by one (mod n), so a
  negative NEVER equals the positive's entity. Two joins: edge->index
  on the entity (to learn the true id) and draw->entity (to realize
  the sample); both shuffle on dimension-sized keys, nothing is
  collected to the driver.

Determinism is the point: rand()-based sampling changes under retries,
repartitioning, and engines; this scheme is bit-reproducible (the
DuckDB oracle regenerates identical negatives), which makes training
corpora resumable and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


from ..functions.hashing import md5_u64 as _md5_u64  # single shared definition


def dense_index(
    universe: DataFrame, entity_col: str, n_salts: int = 64
) -> DataFrame:
    """(entity, idx) with idx a dense 0..n-1 id, salt-major order.

    The per-salt window is the only sort; each reducer sees ~n/n_salts
    entities. The offset table is n_salts rows — its running-sum window
    is a no-op reducer."""
    ents = universe.select(F.col(entity_col).alias("entity")).distinct()
    salted = ents.withColumn(
        "_salt", (_md5_u64(F.col("entity").cast("string")) % n_salts).cast("int")
    )
    rn = F.row_number().over(Window.partitionBy("_salt").orderBy("entity"))
    ranked = salted.withColumn("_rn", rn)
    offsets = (
        ranked.groupBy("_salt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_salt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_salt", "_off")
    )
    return ranked.join(F.broadcast(offsets), "_salt").select(
        "entity", (F.col("_off") + F.col("_rn") - 1).cast("long").alias("idx")
    )


def negative_samples(
    edges: DataFrame,
    edge_id_col: str,
    entity_col: str,
    universe: DataFrame,
    salt: str = "neg",
    n_salts: int = 64,
    strict: bool = False,
) -> DataFrame:
    """One corrupted entity per edge: (edge_id, entity, neg_entity),
    with neg_entity != entity always (collision shifts by one mod n).

    Contract (ADVICE r3): every edge's ``entity_col`` value must appear
    in ``universe`` — the dense-index join is INNER, so an uncovered
    edge is dropped from the training corpus rather than corrupted.
    ``strict=True`` pays one extra anti-join count job and raises if any
    edge would be lost; the default stays off because at corpus scale
    the caller builds the universe FROM the edges (coverage holds by
    construction) and the extra job is pure overhead."""
    # the index is consumed three times (count, true-idx join, draw
    # join): materialize it once instead of replaying the distinct +
    # window lineage per consumer
    uni = dense_index(universe, entity_col, n_salts).localCheckpoint(eager=True)
    n = uni.count()
    if n < 2:
        raise ValueError("negative sampling needs an entity universe >= 2")
    if strict:
        lost = (
            edges.select(F.col(entity_col).alias("entity"))
            .join(uni, "entity", "left_anti")
            .count()
        )
        if lost:
            raise ValueError(
                f"negative_samples: {lost} edge rows reference entities missing "
                f"from the universe and would be silently dropped — extend the "
                f"universe or sample with strict=False deliberately"
            )
    draw = (
        _md5_u64(F.concat_ws(":", F.lit(salt), F.col("edge_id").cast("string")))
        % n
    ).cast("long")
    tagged = (
        edges.select(
            F.col(edge_id_col).alias("edge_id"),
            F.col(entity_col).alias("entity"),
        )
        .join(uni.withColumnRenamed("idx", "_true_idx"), "entity")
        .withColumn("_draw", draw)
        .withColumn(
            "_neg_idx",
            F.when(F.col("_draw") == F.col("_true_idx"), (F.col("_draw") + 1) % n)
            .otherwise(F.col("_draw")),
        )
    )
    cand = uni.select(
        F.col("idx").alias("_neg_idx"), F.col("entity").alias("neg_entity")
    )
    return tagged.join(cand, "_neg_idx").select("edge_id", "entity", "neg_entity")
