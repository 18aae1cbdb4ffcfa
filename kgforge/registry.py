"""Operator registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each operator module registers ``OpSpec`` rows; ``__spark_entry__`` exposes
them to the driver. An op with ``sql=None`` is non-SQL-expressible and gets
the driver's weaker rows-only check (SURVEY.md §2.B).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class OpSpec:
    key: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None => weak (rows-only) check
    doc: str = ""


_REGISTRY: dict[str, OpSpec] = {}


def register(key: str, sql: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate op key {key!r}")
        _REGISTRY[key] = OpSpec(key=key, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_ops() -> dict[str, OpSpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for side effect: each module registers its ops.
    from kgforge.ops import (  # noqa: F401
        functions,
        graph,
        multimodal,
        pipeline_ops,
        relational,
        similarity,
        streaming_batch,
        text,
    )

    _LOADED = True
