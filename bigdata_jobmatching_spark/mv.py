"""Materialized-view rollup serving — the aggregate-navigator piece
of a warehouse engine (Calcite-style MV rewrite, reduced to the
SUM-reaggregatable case that covers dashboard rollups).

A :class:`MatView` declares its grain (``dims``), its reaggregatable
measures (SUM-mergeable columns — COUNT rides as a SUM of a count
column, the same trick every rollup engine uses), and the functional
rollups it can derive (``rollup_exprs``: derived dim -> SQL over the
MV's own columns, e.g. ``month = trunc(day, 'month')``).
:func:`serve` answers a grouping request from the FIRST registered
view that can (callers register coarsest-first, so the cheapest
servable source wins), falling back to the base builder when none
can — and returns which source it chose so callers and tests can
assert the scan economics, not just the values.

Why this matters at 100 TB: a month × type dashboard over raw events
scans the event table; served from a (day, type) MV it scans
|days| × |types| rows — the IVM sink (streaming/ivm.py) keeps such
MVs fresh incrementally, and this module is the read-side contract
that makes the investment pay. Correctness is the algebra: SUM is
associative-commutative, so re-aggregating a partial aggregate along
a FUNCTIONAL dimension derivation equals aggregating base — the
mv_rollup_serving gate query hash-proves exactly that equality
against a DuckDB oracle computed from base.

Reference parity note: the reference materializes fixed dashboard
aggregates into warehouse tables (SURVEY.md §2.10) but rewrites
nothing; this is the Spark-first generalization.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MatView:
    """A published SUM-reaggregatable aggregate at a fixed grain."""

    name: str
    dims: tuple[str, ...]
    measures: tuple[str, ...]
    frame: DataFrame
    rollup_exprs: Mapping[str, str] = field(default_factory=dict)

    def can_serve(self, request_dims: tuple[str, ...]) -> bool:
        """Every requested dim must be an MV dim or derivable from
        one via a declared functional expression."""
        return all(
            d in self.dims or d in self.rollup_exprs for d in request_dims
        )

    def roll_to(self, request_dims: tuple[str, ...]) -> DataFrame:
        """Re-aggregate the MV to the requested grain (exact: SUM of
        partial SUMs along a functional derivation)."""
        if not self.can_serve(request_dims):
            raise ValueError(
                f"MV {self.name} (dims {self.dims}) cannot serve "
                f"{request_dims}")
        proj = self.frame
        for d in request_dims:
            if d not in self.dims:
                proj = proj.withColumn(d, F.expr(self.rollup_exprs[d]))
        return (
            proj.groupBy(*request_dims)
            .agg(*[F.sum(m).alias(m) for m in self.measures])
        )


def serve(
    request_dims: tuple[str, ...],
    views: list[MatView],
    base_builder: Callable[[], DataFrame],
) -> tuple[DataFrame, str]:
    """Serve a grouping request from the first servable registered
    view (register coarsest-first), else from base. Returns
    ``(frame, source_name)`` — source is the MV's name or "base"."""
    for mv in views:
        if mv.can_serve(request_dims):
            return mv.roll_to(request_dims), mv.name
    return base_builder(), "base"
