"""Keyed merge/upsert over immutable columnar storage — the batch
MERGE INTO pattern (dimension refresh, CDC apply) for engines without a
transactional table format, and the logical plan Iceberg/Delta MERGE
compiles to anyway.

Scale posture: prefer-updates merge needs ONE anti join, not a full
outer join — and the realistic case (small change set against a huge
target) broadcasts the update keys, so the target is a single
map-side-filtered scan with no shuffle at all. Deletes ride along as
tombstone rows, filtered before the union. The output is written back
partition-aligned by the caller (write_triples-style layout), giving
resumable incremental refresh without a table-format dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tombstone_col: Optional[str] = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE: rows in ``updates`` replace same-key rows in ``target``;
    unmatched update rows insert; update rows with ``tombstone_col``
    true delete their key. Exactly one row per key survives per side
    (pre-dedupe a CDC stream to latest-per-key first — see
    ``latest_per_key``).
    """
    keys = list(keys)
    upd_keys = updates.select(*keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    survivors = target.join(upd_keys, keys, "left_anti")
    if tombstone_col is not None:
        live = updates.filter(~F.coalesce(F.col(tombstone_col), F.lit(False))).drop(
            tombstone_col
        )
    else:
        live = updates
    return live.select(target.columns).unionByName(survivors)


def latest_per_key(
    cdc: DataFrame, keys: Sequence[str], version_col: str
) -> DataFrame:
    """Collapse a CDC/changelog stream to its newest row per key
    (deterministic: ties broken by the full row's remaining order
    columns are the caller's contract — pass a strictly increasing
    version). One window shuffle on the keys."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        cdc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
