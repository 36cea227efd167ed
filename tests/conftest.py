from __future__ import annotations

import os

import pytest

os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from rle_array_spark.engine import session

    s = session(app="rle-array-spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences(spark, tmp_path_factory):
    """Small deterministic synthetic corpus registered as a parquet table."""
    import pyarrow.parquet as pq

    from rle_array_spark.datagen import generate_table

    path = tmp_path_factory.mktemp("data") / "sequences.parquet"
    pq.write_table(generate_table(n_blocks=1, rows_per_source=15), str(path))
    return spark.read.parquet(str(path))


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
