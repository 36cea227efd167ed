"""Real-Iceberg-catalog seam: config-only switch from the sandbox tableio
layout to Apache Iceberg tables.

This repo's writer (tableio.py) implements Iceberg's semantics — immutable
data files, atomic snapshot commits, time travel, vacuum — over plain
Parquet + JSON manifests, because no Iceberg runtime jar exists in the
sandbox. On a cluster the switch is configuration, not code: build the
session with :func:`iceberg_configs` and write the SAME encoded-blocks
DataFrame (engine.BLOCK_SCHEMA) through :func:`write_blocks_iceberg`.

Verified unavailable here (no iceberg-spark-runtime in pyspark/jars), so
every entry point probes for the runtime first and raises a single clear
``IcebergUnavailable`` instead of a Py4J class-not-found — tested in
tests/test_iceberg_seam.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Matches the pyspark 4.x line shipped here; override for other Spark lines.
DEFAULT_RUNTIME_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


class IcebergUnavailable(RuntimeError):
    """The Iceberg Spark runtime jar is not on the session classpath."""


def iceberg_configs(
    catalog: str = "local",
    warehouse: str = "/tmp/iceberg-warehouse",
    runtime_package: str = DEFAULT_RUNTIME_PACKAGE,
) -> dict[str, str]:
    """Session configs for a Hadoop-catalog Iceberg deployment. Pass each as
    ``--conf k=v`` to spark-submit (or ``.config(k, v)`` on the builder)
    BEFORE the session starts — Spark catalogs cannot be registered into a
    running session."""
    return {
        "spark.jars.packages": runtime_package,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime classes are loadable in this session."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "Iceberg Spark runtime not on the classpath; start the session "
            "with iceberg_configs() (spark.jars.packages="
            f"{DEFAULT_RUNTIME_PACKAGE}). In this sandbox use the tableio "
            "Parquet+manifest layout, which has the same snapshot semantics."
        )


def write_blocks_iceberg(
    blocks: DataFrame, table: str, partition_by: tuple[str, ...] = ("source",)
) -> None:
    """Append encoded blocks to an Iceberg table (created on first write,
    partitioned by ``partition_by`` — the same source/length layout the
    sandbox writer uses). Iceberg gives atomic snapshot commits per job,
    so the per-partition lineage sidecars remain audit-only there."""
    _require(blocks.sparkSession)
    writer = blocks.writeTo(table).using("iceberg")
    if not blocks.sparkSession.catalog.tableExists(table):
        writer.partitionedBy(*[blocks[c] for c in partition_by]).create()
    else:
        writer.append()


def read_blocks_iceberg(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an encoded-blocks Iceberg table, optionally time-travelling to a
    snapshot id (the catalog analog of tableio.read_blocks(snapshot=N))."""
    _require(spark)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.load(table)
