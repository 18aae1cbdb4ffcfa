"""Loaders for the driver-provided parquet tables (TESTDATA.md).

All reads go through ``load`` so projection/predicate pushdown is preserved —
callers should `.select(...)`/`.where(...)` immediately after and let Catalyst
push into the parquet scan (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown driver table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
