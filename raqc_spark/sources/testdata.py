"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` so Catalyst gets the parquet footer schema and
can push filters / prune columns straight into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
