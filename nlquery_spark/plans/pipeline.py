"""Staged pipeline runner: per-stage checkpoints, per-partition
metrics, lineage records, and resume-from-checkpoint (north_rule).

Checkpoints land either as parquet directories (default; atomic
_SUCCESS marker per stage) or as Iceberg table snapshots when the
session has an Iceberg catalog configured (pass ``catalog="local.db"``
and build the session with ``get_spark(iceberg_warehouse=...)``).
All filesystem access goes through the Hadoop FileSystem API, so the
same code resumes from ``file://``, ``hdfs://`` or ``s3a://`` workdirs
— a driver-local ``os.path`` check would silently recompute every
stage on a real cluster.

Parquet layout under ``workdir``:
  <stage>/            checkpointed output (parquet)
  _meta/<stage>.json  lineage: inputs, row count, wall time, config hash
  _metrics/<stage>/   per-partition row counts (parquet)

Iceberg layout (``catalog`` set): tables ``<catalog>.<stage>`` plus
``<catalog>.<stage>__metrics``; lineage JSON still lands under
``workdir/_meta`` via the Hadoop FS.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


# ------------------------------------------------------------- hadoop fs --
# Cluster-safe path ops (work for file://, hdfs://, s3a://). The JVM
# gateway objects are tiny driver-side calls — no data moves.


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    jp = _jpath(spark, path)
    conf = spark._jsc.hadoopConfiguration()
    return jp.getFileSystem(conf), jp


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jp = _fs(spark, path)
    return bool(fs.exists(jp))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, jp = _fs(spark, path)
    fs.mkdirs(jp)


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jp = _fs(spark, path)
    out = fs.create(jp, True)  # overwrite
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, Dict[str, DataFrame]], DataFrame]
    # partition columns for the checkpoint (e.g. pred for triples)
    partition_by: Optional[List[str]] = None


class Pipeline:
    """Resumable staged job.

    ``catalog=None`` (default): parquet checkpoints under ``workdir``.
    ``catalog="local.db"``: each stage materializes as an Iceberg table
    ``local.db.<name>`` (requires an Iceberg-enabled session — see
    ``plans.session.get_spark(iceberg_warehouse=...)``); resume checks
    table existence instead of _SUCCESS markers and benefits from
    Iceberg's atomic snapshot commits.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        stages: List[Stage],
        catalog: Optional[str] = None,
    ):
        self.spark = spark
        self.workdir = workdir.rstrip("/")
        self.stages = stages
        self.catalog = catalog
        fs_mkdirs(spark, f"{self.workdir}/_meta")

    # ------------------------------------------------------ checkpoints --

    def _stage_path(self, name: str) -> str:
        return f"{self.workdir}/{name}"

    def _table(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def _is_complete(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._table(name))
        return fs_exists(self.spark, f"{self._stage_path(name)}/_SUCCESS")

    def _read_checkpoint(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(self._table(name))
        return self.spark.read.parquet(self._stage_path(name))

    def _write_checkpoint(self, name: str, df: DataFrame, partition_by) -> None:
        if self.catalog:
            writer = df.writeTo(self._table(name)).using("iceberg")
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._stage_path(name))

    # -------------------------------------------------------------- run --

    def run(
        self, inputs: Optional[Dict[str, DataFrame]] = None, force: bool = False
    ) -> Dict[str, DataFrame]:
        """Run all stages; completed stages (by checkpoint marker /
        Iceberg snapshot) are loaded, not recomputed — kill the job
        anywhere and rerun to resume."""
        ctx: Dict[str, DataFrame] = dict(inputs or {})
        # stage fns may record operator metrics (e.g. skew-cap drop
        # counts) under ctx["_metrics"][<stage>]; persisted with lineage
        ctx.setdefault("_metrics", {})
        report: List[dict] = []
        for stage in self.stages:
            if not force and self._is_complete(stage.name):
                ctx[stage.name] = self._read_checkpoint(stage.name)
                report.append({"stage": stage.name, "status": "resumed"})
                continue
            t0 = time.time()
            out = stage.fn(self.spark, ctx)
            self._write_checkpoint(stage.name, out, stage.partition_by)
            wall = time.time() - t0
            df = self._read_checkpoint(stage.name)
            ctx[stage.name] = df
            self._write_metrics(stage.name, df)
            n_rows = df.count()
            meta = {
                "stage": stage.name,
                "inputs": sorted(set(ctx) - {stage.name, "_metrics"}),
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            stage_metrics = ctx["_metrics"].get(stage.name)
            if stage_metrics:
                meta["metrics"] = stage_metrics
            fs_write_text(
                self.spark, f"{self.workdir}/_meta/{stage.name}.json", json.dumps(meta)
            )
            report.append({"stage": stage.name, "status": "computed", **meta})
        self._report = report
        return ctx

    def _write_metrics(self, name: str, df: DataFrame) -> None:
        metrics = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count(F.lit(1)).alias("rows")
        )
        if self.catalog:
            metrics.writeTo(self._table(f"{name}__metrics")).using(
                "iceberg"
            ).createOrReplace()
            return
        metrics.write.mode("overwrite").parquet(f"{self.workdir}/_metrics/{name}")

    @property
    def report(self) -> List[dict]:
        return getattr(self, "_report", [])


def kg_pipeline(
    workdir: str,
    schema_specs,
    options_spec=None,
    canonical_threshold: float = 0.6,
    with_graph: bool = True,
) -> List[Stage]:
    """The standard KG-construction pipeline: extract -> dedup ->
    canonicalize -> graph metrics -> link-prediction candidates
    (stages S2-S6 of SURVEY.md §3.4 plus
    the graph-materialize pass the north rule names)."""
    from ..operators.canonicalize import canonicalize_triples, pagerank
    from ..operators.extract import dedup_triples, extract_triples

    def s_extract(spark, ctx):
        return extract_triples(ctx["pages"], schema_specs, options_spec)

    def s_dedup(spark, ctx):
        return dedup_triples(ctx["extract"])

    def s_canonical(spark, ctx):
        m = ctx["_metrics"].setdefault("canonical", {})
        return canonicalize_triples(
            ctx["dedup"], threshold=canonical_threshold, metrics=m
        )

    def s_graph(spark, ctx):
        """Graph-metrics materialization over the canonical triples:
        per-entity PageRank (adaptive driver/distributed), in/out
        degrees, and triangle participation — one row per node, the
        artifact entity-salience ranking and KG-quality dashboards read.
        The distinct edge set feeds four consumers, so it materializes
        once; ranks are rounded to 9 decimals so the checkpoint is
        bit-stable across cluster sizes (raw double power-iteration
        sums carry ~1e-15 order noise)."""
        from ..operators.graph import triangle_counts

        m = ctx["_metrics"].setdefault("graph", {})
        edges = (
            ctx["canonical"]
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
        m["n_edges"] = edges.count()
        # FIXED-ITERATION mode (tol=0), not convergence mode: on the
        # distributed path the L1-delta stop test is a partition-order-
        # dependent double sum, so a delta within ~1e-15 of tol could
        # stop one cluster size at round k and another at k+1 — a
        # ~1e-6 rank shift that defeats the 9-decimal rounding and the
        # bit-stable-checkpoint claim. 100 rounds: damping 0.85
        # contracts error ~0.85/round, so 1e-6-level accuracy is
        # reached with margin, identically on every cluster size.
        pr = pagerank(edges, tol=0.0, max_iter=100, metrics=m)
        out_deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("out_degree")
        )
        in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("in_degree")
        )
        tris = triangle_counts(edges)
        return (
            pr.select("node", F.round("rank", 9).alias("rank"))
            .join(out_deg, "node", "left")
            .join(in_deg, "node", "left")
            .join(tris, "node", "left")
            .fillna(0, subset=["out_degree", "in_degree", "n_triangles"])
        )

    def s_linkpred(spark, ctx):
        """KG-completion candidates over the canonical graph: NON-edge
        entity pairs sharing >= 2 neighbors, ranked by Jaccard overlap
        (operators/graph.py::common_neighbor_scores) — the review queue
        a completion pass consumes. The ARTIFACT is bounded: top-20
        candidates per anchor node (jaccard, n_common, node-id ordered —
        deterministic), because the raw candidate set over a hubby KG is
        quadratic-ish in neighborhoods (measured: 2.48M unbounded rows
        for a 7.7k-node fixture graph) and a review queue past the top
        handful per entity is dead weight. Wedge fan-out is capped per
        node with drop counts recorded in this stage's lineage metrics,
        and scores are ROUNDed (6), so the checkpoint is bit-stable
        across cluster sizes like every other stage."""
        from pyspark.sql import Window

        from ..operators.graph import common_neighbor_scores

        m = ctx["_metrics"].setdefault("linkpred", {})
        edges = (
            ctx["canonical"]
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
        )
        # max_center_degree=1000: the extracted KG is hub-heavy
        # (gazetteer anchor entities co-occur with most of the graph);
        # measured at 200k pages, 71 centers above degree 1000 carried
        # 16.3e9 of 16.3e9+24e6 wedges — and a neighbor shared by half
        # the graph is evidence of nothing (the Adamic-Adar argument).
        # The cutoff bounds the wedge join at ~24M rows on that graph;
        # excluded-center and cap counts land in this stage's lineage.
        cand = common_neighbor_scores(
            edges, min_common=2, max_center_degree=1000, metrics=m
        )
        w = Window.partitionBy("node_a").orderBy(
            F.desc("jaccard"), F.desc("n_common"), F.asc("node_b")
        )
        return (
            cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 20)
            .drop("rk")
        )

    stages = [
        Stage("extract", s_extract),
        Stage("dedup", s_dedup),
        Stage("canonical", s_canonical, partition_by=["pred"]),
    ]
    if with_graph:
        stages.append(Stage("graph", s_graph))
        stages.append(Stage("linkpred", s_linkpred))
    return stages
