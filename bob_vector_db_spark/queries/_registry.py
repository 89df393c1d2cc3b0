"""Registry core: QuerySpec, the REGISTRY dict, @register."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession



@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        if name in REGISTRY:
            # a silent dict overwrite would shadow an existing green query
            # (it happened: round 6 re-used round 4's api_search_groups
            # name) — refuse at import time instead
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn
    return deco
