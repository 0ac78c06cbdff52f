"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 registers here; the driver
contract (`__spark_entry__.py`) re-exports it.  Entries without oracle
SQL (genuinely non-SQL-expressible ops) get a rows-only check.

Determinism rules every entry follows (so order-insensitive value-hash
comparison against DuckDB is exact):
- double sums go through DECIMAL (exact, partition-order independent);
- computed doubles are ROUNDed at the edge;
- every computed column is aliased identically in Spark and SQL;
- top-k orderings always include a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import query modules lazily so registration happens on first use.
    from .queries import core, northstar, streaming_q  # noqa: F401

    return dict(_REGISTRY)
