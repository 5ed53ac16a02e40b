"""The named-query catalog: every engine capability is exposed as a
(name -> Spark builder, name -> oracle SQL) pair.

The Spark builder takes (spark, sf_dir) and returns a DataFrame; the
oracle is the equivalent ANSI SQL DuckDB runs on the same parquet
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names are aliased identically on both
sides — the correctness gate hashes values under sorted column names.

Determinism conventions (SURVEY §5):
- Aggregates over floating columns cast per-row to DECIMAL first,
  so the sum is exact and order-independent; final outputs cast back
  to DOUBLE (same exact value -> same double on both engines).
- Ratios/scores derived from exact integers are rounded to 6 dp.
- Every top-k imposes a total order (unique-key tie-break).
- Array outputs are sorted before comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect registration)."""
    from . import analytics_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import domain_queries  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_extra  # noqa: F401
    from . import mixing_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    from . import relational_extra2  # noqa: F401
    from . import skills_queries  # noqa: F401
    from . import temporal_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import vector_queries  # noqa: F401

    return REGISTRY
