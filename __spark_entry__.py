"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kgforge/`` (see SURVEY.md); this module is a thin
adapter over ``kgforge.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full KG-construction pipeline (extract → link → canonicalize →
    materialize) over transcripts derived deterministically from the sf0.001
    documents table and returns the materialized (subj, pred, obj) triples.
    """
    from kgforge.flagship import run_flagship

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return run_flagship(spark, "/root/testdata/sf0.001")


def _pinned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin session confs the oracles depend on: the driver supplies its own
    SparkSession, and a non-UTC timezone would skew every timestamp compare
    against DuckDB; Arrow transport must be on for the pandas-UDF ops."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kgforge.registry import all_ops

    return {k: _pinned(spec.fn) for k, spec in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each full-oracle query key."""
    from kgforge.registry import all_ops

    return {k: spec.sql for k, spec in all_ops().items() if spec.sql is not None}
