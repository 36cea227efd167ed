"""The Iceberg seam must fail loudly-and-clearly in this jar-less sandbox
and expose the exact configs a real deployment needs."""

from __future__ import annotations

import pytest

from rle_array_spark import iceberg


def test_configs_shape():
    cfg = iceberg.iceberg_configs(catalog="c1", warehouse="/w")
    assert cfg["spark.sql.catalog.c1"] == "org.apache.iceberg.spark.SparkCatalog"
    assert cfg["spark.sql.catalog.c1.warehouse"] == "/w"
    assert "iceberg-spark-runtime" in cfg["spark.jars.packages"]
    assert "IcebergSparkSessionExtensions" in cfg["spark.sql.extensions"]


def test_unavailable_in_sandbox(spark, sequences):
    from rle_array_spark.engine import encode_df

    assert iceberg.iceberg_available(spark) is False
    blocks = encode_df(sequences.limit(2), codec="rle")
    with pytest.raises(iceberg.IcebergUnavailable, match="tableio"):
        iceberg.write_blocks_iceberg(blocks, "local.db.blocks")
    with pytest.raises(iceberg.IcebergUnavailable):
        iceberg.read_blocks_iceberg(spark, "local.db.blocks")
