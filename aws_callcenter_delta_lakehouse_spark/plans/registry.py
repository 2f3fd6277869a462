"""Query registry machinery.

Every operator the engine claims (SURVEY.md §2 inventory + the
LLM-pipeline extensions) is registered here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus, when SQL-expressible,
an equivalent ANSI-SQL oracle string for DuckDB differential testing.
``__spark_entry__`` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered testdata views
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a named query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
