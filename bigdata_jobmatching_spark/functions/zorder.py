"""Z-order (Morton) keys for multi-dimensional file clustering.

Sort-clustering a table by one column gives min/max row-group
skipping on that column only; interleaving the bits of two (or more)
rank-normalized columns gives moderate skipping on EACH of them —
the standard multi-dimensional layout trick (Delta/Iceberg OPTIMIZE
ZORDER) built here from native expressions: no UDF, the key is one
whole-stage-codegen projection.

Columns are first rank-normalized onto a fixed grid (approx-quantile
bucket bounds, broadcast as literals), because Morton keys only
interleave usefully on uniform integer grids; raw skewed values
would waste high bits. The quantile probe is one extra pass at write
time — the read-side payoff is row-group pruning on every keyed
dimension forever after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int
    columns: result bit 2i = a's bit i, bit 2i+1 = b's bit i. Pure
    shift/or/and expression tree — JVM-side, no Python."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 6,
    n_files: int | None = None,
) -> None:
    """Land ``df`` Z-ordered on (col_a, col_b): bucket both columns on
    approx-quantile grid bounds (one pass, broadcast — no global
    window), Morton-interleave the bucket ids, range-partition + sort
    by the key, write parquet. Row-group min/max stats then prune
    selective predicates on EITHER column.

    ``bits`` defaults to 6 (64 buckets per dimension, 4096 cells):
    the grid only needs to out-resolve the row-group count, and the
    bucketing expression is 2^bits-1 literal comparisons per column —
    a deliberately small plan (large literal trees are the known
    codegen killer; see SCALING.md on LSH plane literals)."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    bounds_a, bounds_b = (
        df.stat.approxQuantile(c, probs, 0.001) for c in (col_a, col_b)
    )

    def bucket(col: str, bounds: list[float]) -> Column:
        # branch-free bucketing: sum of (value >= bound) over the bound
        # literals — 63 comparisons at the default, folded by codegen
        acc = F.lit(0)
        for bd in bounds:
            acc = acc + F.when(F.col(col) >= F.lit(bd), 1).otherwise(0)
        return acc

    keyed = df.withColumn(
        "_zkey",
        interleave_bits(bucket(col_a, bounds_a), bucket(col_b, bounds_b), bits),
    )
    out = keyed.repartitionByRange(
        *( [n_files, "_zkey"] if n_files else ["_zkey"] )
    ).sortWithinPartitions("_zkey")
    out.drop("_zkey").write.mode("overwrite").parquet(path)
