"""Top-k per group — the dashboard workload's core operator.

Reference declares "Top 10 compétences", "Top 20 offres-CVs"
(PLAN_REALISATION.md:483-485,509-511; SURVEY §2.5 W4). Window +
row_number is the scalable form: it shuffles once on the partition
key and keeps k rows per group map-side after the sort — no global
sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows per group. ``order_cols`` must impose a
    total order (append a unique key as tie-break) for determinism."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_topk(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k: orderBy + limit. Spark plans this as a
    TakeOrderedAndProject — each partition keeps k rows, only k×P
    rows reach the final merge, no full sort at 100 TB."""
    return df.orderBy(*order_cols).limit(k)
