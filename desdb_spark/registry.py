"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2B registers here with its PySpark
implementation and (when hash-checkable) its DuckDB oracle SQL, so the
engine and its differential oracle live side by side (SURVEY.md §7.0).
``__spark_entry__.py`` builds ``queries()`` / ``oracle_sql()`` from this.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Operator:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    group: str = ""
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Operator] = {}

#: Modules that register operators on import (SURVEY.md §2B groups).
_OP_MODULES = (
    "desdb_spark.operators.scans",
    "desdb_spark.operators.projections",
    "desdb_spark.operators.joins",
    "desdb_spark.operators.aggregates",
    "desdb_spark.operators.aggregates_ext",
    "desdb_spark.operators.windows",
    "desdb_spark.operators.sorts_sets",
    "desdb_spark.functions.scalars",
    "desdb_spark.functions.udfs",
    "desdb_spark.functions.paths",
    "desdb_spark.sources.sinks",
    "desdb_spark.plans.lineage",
    "desdb_spark.streaming.windows",
    "desdb_spark.streaming.stateful",
    "desdb_spark.extensions.dedup",
    "desdb_spark.extensions.similarity",
    "desdb_spark.extensions.text",
    "desdb_spark.extensions.multimodal",
)


def register(
    name: str, oracle: str | None = None, group: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")
        _REGISTRY[name] = Operator(
            name=name, fn=fn, oracle=oracle, group=group, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def _load_all() -> None:
    for mod in _OP_MODULES:
        importlib.import_module(mod)


def all_operators() -> dict[str, Operator]:
    """Import every operator module and return the full registry."""
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: op.fn for name, op in all_operators().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: op.oracle for name, op in all_operators().items() if op.oracle is not None
    }
