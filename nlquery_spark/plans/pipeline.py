"""Staged pipeline runner: per-stage parquet checkpoints, per-partition
metrics, lineage records, and resume-from-checkpoint (north_rule).

On an Iceberg catalog each stage would land as a table snapshot; the
parquet layout used here has the same resume semantics (atomic _SUCCESS
marker per stage) and keeps the sandbox dependency-free.

Layout under ``workdir``:
  <stage>/            checkpointed output (parquet)
  _meta/<stage>.json  lineage: inputs, row count, wall time, config hash
  _metrics/<stage>/   per-partition row counts (parquet)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, Dict[str, DataFrame]], DataFrame]
    # partition columns for the checkpoint (e.g. pred for triples)
    partition_by: Optional[List[str]] = None


class Pipeline:
    def __init__(self, spark: SparkSession, workdir: str, stages: List[Stage]):
        self.spark = spark
        self.workdir = workdir
        self.stages = stages
        os.makedirs(os.path.join(workdir, "_meta"), exist_ok=True)

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _is_complete(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(name), "_SUCCESS"))

    def run(
        self, inputs: Optional[Dict[str, DataFrame]] = None, force: bool = False
    ) -> Dict[str, DataFrame]:
        """Run all stages; completed stages (by _SUCCESS marker) are
        loaded from checkpoint, not recomputed — kill the job anywhere
        and rerun to resume."""
        ctx: Dict[str, DataFrame] = dict(inputs or {})
        report: List[dict] = []
        for stage in self.stages:
            path = self._stage_path(stage.name)
            if not force and self._is_complete(stage.name):
                ctx[stage.name] = self.spark.read.parquet(path)
                report.append({"stage": stage.name, "status": "resumed"})
                continue
            t0 = time.time()
            out = stage.fn(self.spark, ctx)
            writer = out.write.mode("overwrite")
            if stage.partition_by:
                writer = writer.partitionBy(*stage.partition_by)
            writer.parquet(path)
            wall = time.time() - t0
            df = self.spark.read.parquet(path)
            ctx[stage.name] = df
            self._write_metrics(stage.name, df)
            n_rows = df.count()
            meta = {
                "stage": stage.name,
                "inputs": sorted(set(ctx) - {stage.name}),
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            with open(
                os.path.join(self.workdir, "_meta", f"{stage.name}.json"), "w"
            ) as fh:
                json.dump(meta, fh)
            report.append({"stage": stage.name, "status": "computed", **meta})
        self._report = report
        return ctx

    def _write_metrics(self, name: str, df: DataFrame) -> None:
        (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .write.mode("overwrite")
            .parquet(os.path.join(self.workdir, "_metrics", name))
        )

    @property
    def report(self) -> List[dict]:
        return getattr(self, "_report", [])


def kg_pipeline(
    workdir: str,
    schema_specs,
    options_spec=None,
    canonical_threshold: float = 0.6,
) -> List[Stage]:
    """The standard KG-construction pipeline: extract -> dedup ->
    canonicalize (stages S2-S6 of SURVEY.md §3.4)."""
    from ..operators.canonicalize import canonicalize_triples
    from ..operators.extract import dedup_triples, extract_triples

    def s_extract(spark, ctx):
        return extract_triples(ctx["pages"], schema_specs, options_spec)

    def s_dedup(spark, ctx):
        return dedup_triples(ctx["extract"])

    def s_canonical(spark, ctx):
        return canonicalize_triples(ctx["dedup"], threshold=canonical_threshold)

    return [
        Stage("extract", s_extract),
        Stage("dedup", s_dedup),
        Stage("canonical", s_canonical, partition_by=["pred"]),
    ]
