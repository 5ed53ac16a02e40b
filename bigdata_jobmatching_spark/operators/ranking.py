"""Distributed global ranking — exact rank/ntile with no single-task sort.

The naive form of a global rank or ntile is ``Window.orderBy(key)`` —
Spark plans that as ``Exchange SinglePartition`` + one task sorting the
WHOLE frame, the shape the round-12 verdict flagged on
``order_price_deciles``, ``priority_rate_by_price_decile`` and
``customer_rfm_scores`` (reference analog: the salary-decile dashboard
cuts, PLAN_REALISATION.md:483-511). This module provides the
scale-safe equivalent built on DETERMINISTIC order-aligned buckets:

1. The caller supplies ``bucket_cols`` — pure functions of the row
   whose lexicographic ASC order is aligned with the requested total
   order (e.g. ``floor(price / 256)`` for ``price ASC``, or
   ``-unix_date(d)`` for ``d DESC``), with a VALUE-BOUNDED number of
   distinct buckets (thousands, independent of row count).
2. ``row_number`` partitioned by the buckets — one ordinary hash
   shuffle, P parallel sorts of ~N/B rows each.
3. A bucket histogram (``groupBy(bucket).count()`` — tiny) self-joined
   into exclusive prefix sums and broadcast back: global rank =
   bucket offset + local row number. Exact, no sampling, no gather.

Why not ``repartitionByRange`` + ``spark_partition_id``? That variant
is UNSOUND under plan forks: the ranked branch and the offsets branch
each consume the range exchange, and whenever column pruning makes the
two subtrees non-identical Spark does NOT reuse the exchange — it runs
``RangePartitioner`` twice, and its reservoir-sampling seed
incorporates the RDD id, so the two runs can pick DIFFERENT partition
boundaries. The offset map then belongs to a different partitioning
than the ranked rows (observed live: priority_rate_by_price_decile
produced 11 uneven "deciles"). Deterministic bucket expressions make
every fork recompute-safe by construction.

``ntile_from_rank`` reproduces SQL NTILE(n) bit-for-bit from the rank
via pure integer arithmetic (first ``N % n`` buckets get
``N div n + 1`` rows), so ntile-shaped dashboards keep their oracle
hashes while dropping the single-partition funnel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOCAL = "__gr_local"
_OFFSET = "__gr_offset"
_CNT = "__gr_cnt"


def global_ranks(
    df: DataFrame,
    order_cols: list[Column],
    bucket_cols: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Add an exact 1-based global rank over ``order_cols`` without a
    single-partition sort.

    Contract: ``order_cols`` must impose a TOTAL order (append a unique
    key as tie-break); ``bucket_cols`` must be deterministic, non-null,
    and lexicographically ASC-aligned with that order (every row of
    bucket b sorts before every row of bucket b' > b), with a bounded
    distinct-bucket count (keep it in the low thousands: the offset
    step is a B x B broadcast triangle). When ``total_col`` is given,
    the total row count N is attached too (ntile needs it).

    Cost: one hash shuffle of ``df`` on the buckets + parallel
    per-bucket sorts + a tiny bucket-grain aggregation and broadcast.
    Every stage is parallel and every fork deterministic.
    """
    bnames = [f"__gr_b{i}" for i in range(len(bucket_cols))]
    withb = df
    for name, expr in zip(bnames, bucket_cols):
        withb = withb.withColumn(name, expr)

    w = Window.partitionBy(*bnames).orderBy(*order_cols)
    ranked = withb.withColumn(_LOCAL, F.row_number().over(w).cast("long"))

    # Deterministic fork: recomputing this aggregate always yields the
    # same (bucket -> count) map, whether or not the exchange is reused.
    hist = withb.groupBy(*bnames).agg(F.count(F.lit(1)).alias(_CNT))

    a_key = F.struct(*[F.col(f"a.{n}") for n in bnames])
    b_key = F.struct(*[F.col(f"b.{n}") for n in bnames])
    agg_cols = [
        F.sum(F.when(b_key < a_key, F.col(f"b.{_CNT}")).otherwise(F.lit(0)))
        .alias(_OFFSET),
    ]
    if total_col is not None:
        agg_cols.append(F.sum(F.col(f"b.{_CNT}")).alias(total_col))
    offsets = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")))  # B x B tiny rows
        .groupBy(*[F.col(f"a.{n}").alias(n) for n in bnames])
        .agg(*agg_cols)
    )
    return (
        ranked.join(F.broadcast(offsets), bnames)
        .withColumn(rank_col, F.col(_OFFSET) + F.col(_LOCAL))
        .drop(*bnames, _LOCAL, _OFFSET)
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor-division for non-negative longs: subtract
    the remainder (exact long arithmetic) so the double division is of
    an exactly-divisible numerator — bit-exact for a < 2^53, far above
    any row count this engine will rank."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n: int, total: Column) -> Column:
    """Bucket of SQL ``NTILE(n)`` for a row of global rank ``rank``
    (1-based) out of ``total`` rows — the exact spec arithmetic: with
    q = total div n and r = total mod n, the first r buckets hold
    q+1 rows, the rest q. Integer-only, engine-independent."""
    q = _idiv(total, F.lit(n).cast("long"))
    r = total % F.lit(n)
    big = q + F.lit(1)  # size of the first r buckets
    in_big = rank <= r * big
    bucket_big = _idiv(rank + big - F.lit(1), big)
    rest = rank - r * big
    # q can be 0 only when total < n; then every rank is in a big
    # bucket and this branch is never taken (non-ANSI x/0 -> NULL).
    bucket_small = r + _idiv(rest + q - F.lit(1), q)
    return F.when(in_big, bucket_big).otherwise(bucket_small).cast("int")


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    bucket_cols: list[Column],
    n: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """NTILE(n) over a global total order, computed distributed:
    ``global_ranks`` + ``ntile_from_rank``. Output matches
    ``F.ntile(n).over(Window.orderBy(*order_cols))`` exactly (given a
    total order and order-aligned ``bucket_cols``) with no
    single-partition window in the plan."""
    total = "__gr_total"
    ranked = global_ranks(df, order_cols, bucket_cols,
                          rank_col="__gr_rank", total_col=total)
    return (
        ranked.withColumn(
            bucket_col, ntile_from_rank(F.col("__gr_rank"), n, F.col(total)))
        .drop("__gr_rank", total)
    )
