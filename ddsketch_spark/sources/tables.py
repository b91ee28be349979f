"""Table loading: testdata parquet + (optional) Iceberg.

The reference's only sources are a CSV of doubles and in-process RNG streams
(main.cpp:1056-1106, 262-318); here sources are columnar DataFrames. Iceberg
is the north-rule target catalog; this sandbox has no Iceberg runtime jar, so
``read_table`` transparently falls back to parquet. All call sites go through
this module so a real cluster only needs to flip ``format``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; Iceberg if ``sf_dir`` is a catalog ref."""
    if sf_dir.startswith("iceberg:"):
        return spark.read.format("iceberg").load(f"{sf_dir[len('iceberg:'):]}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_table(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
