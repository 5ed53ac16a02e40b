"""Skew-mitigation helpers: salted aggregation (two-phase) and a
salted join side.

AQE's skew-join splitting handles join-side skew at runtime; salting
is the explicit lever for aggregation hot keys (one key holding a
large fraction of rows makes a single reducer the straggler). The
two-phase pattern: append a random-ish salt to the key, partial-agg
on (key, salt), then final-agg on key. Both phases are map-side
combinable; the hot key's work spreads across ``n_salts`` reducers.

The salt here is deterministic (hash of a unique column mod n) so
results stay reproducible under the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    salt_source: Column,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the re-aggregable functions; avg
    is derived as sum/count by the caller).
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        else:
            phase1_aggs.append(getattr(F, fn)(F.col(col)).alias(out))
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1_aggs)
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase2 = [refold[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()]
    return partial.groupBy(*group_cols).agg(*phase2)


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_key_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Differentiated skew join: route HOT keys through a broadcast
    join and the cold tail through the normal shuffle join, then
    union. This is the explicit form of what AQE's skew-split does at
    runtime, for when you know the skew in advance (celebrity users,
    null-ish default keys) or need it on a join AQE can't split
    (e.g. under a required output ordering).

    ``fact`` is the large skewed side; ``dim`` must be joinable from
    both branches (it is filtered to hot keys for the broadcast
    branch, so only the hot slice is collected to the driver-side
    broadcast, never the whole dim). Hot keys are detected with one
    count aggregation over the fact side — at 100 TB that scan is
    map-side combinable and far cheaper than one straggler reducer.

    Result equality with the plain join holds for inner/left joins
    because the hot/cold split partitions the fact rows: each fact
    row joins in exactly one branch.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how}")
    hot = (
        fact.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_key_threshold)
        .select(key)
    )
    fact_hot = fact.join(F.broadcast(hot), key, "left_semi")
    fact_cold = fact.join(F.broadcast(hot), key, "left_anti")
    dim_hot = dim.join(F.broadcast(hot), key, "left_semi")
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    joined_cold = fact_cold.join(dim, key, how)
    return joined_hot.unionByName(joined_cold)


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    denom: int = 200,
    summary_k: int = 400,
    merge_summaries: bool = True,
) -> DataFrame:
    """Deterministic-EXACT heavy hitters: every key whose global count
    strictly exceeds n/denom, with its exact count — found WITHOUT a
    full groupBy over the (potentially ultra-high-cardinality) key.

    Phase 1 (candidate pruning): each Arrow batch builds a
    Misra-Gries summary of ``summary_k`` counters. MG guarantees any
    key with local frequency > m/(summary_k+1) survives its batch; by
    averaging, a key with global count > n/denom must exceed
    m_p/denom in some batch, so with summary_k >= denom the candidate
    UNION is a provable superset of the true hitters. Phase 2 (exact
    verify): a broadcast semi-join restricts the corpus to candidates
    and recounts them exactly, so the OUTPUT is exact and independent
    of partitioning/batching regardless of what phase 1 produced —
    the candidate-then-verify shape that makes the answer
    determinism-sweep safe.

    Scale: phase 1 is one narrow pass (no shuffle of the raw stream);
    with ``merge_summaries`` (default) the per-batch summaries — each
    (key, residual_count), at most summary_k rows per batch — merge
    into ONE global MG summary via the mergeable-summaries rule (sum
    residuals per key, subtract the (k+1)-th largest, keep positive;
    Agarwal et al., "Mergeable Summaries": the merged deviation stays
    <= n/(k+1)), so the candidate broadcast is bounded by summary_k
    REGARDLESS of partition count. Phase 2's exactness never depends
    on the merge — it only needs candidate RECALL, which the bound
    guarantees for summary_k + 1 >= denom.

    NULL keys form a reportable group, exactly like SQL's
    ``GROUP BY key HAVING count(*)*denom > n``: they are
    sentinel-encoded before phase 1 (a join or MG counter would
    silently drop them — the ADVICE r5 divergence) and decoded back
    to NULL in the output. The sentinel is a control-character string
    no real key column contains.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    if summary_k + 1 < denom:
        raise ValueError(
            f"summary_k + 1 ({summary_k + 1}) must be >= denom ({denom}) "
            "or the candidate superset guarantee does not hold"
        )

    _NULL_SENTINEL = "\x00\x00__NULL_KEY__"

    cand_schema = T.StructType([
        T.StructField(key_col, T.StringType()),
        T.StructField("__mg_c", T.LongType()),
    ])

    def mg_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counters: dict = {}
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < summary_k:
                    counters[v] = 1
                else:
                    for kk in list(counters):
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            del counters[kk]
            yield pd.DataFrame({
                key_col: list(counters),
                "__mg_c": list(counters.values()),
            })

    keyed = df.select(
        F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_SENTINEL))
        .alias(key_col)
    )
    summaries = keyed.mapInPandas(mg_batches, cand_schema)
    if merge_summaries:
        # one global MG from the batch summaries: tiny input (batches
        # x summary_k rows), one bounded shuffle, output <= summary_k
        summed = summaries.groupBy(key_col).agg(F.sum("__mg_c").alias("__c"))
        n_cand = summed.agg(F.count(F.lit(1)).alias("__nc"))
        kth = (
            summed.orderBy(F.desc("__c"), F.asc(key_col))
            .limit(summary_k + 1)
            .agg(F.min("__c").alias("__kc"))
        )
        thresh = n_cand.crossJoin(F.broadcast(kth)).select(
            F.when(F.col("__nc") <= summary_k, F.lit(0))
            .otherwise(F.col("__kc")).alias("__t")
        )
        cands = (
            summed.crossJoin(F.broadcast(thresh))
            .filter(F.col("__c") > F.col("__t"))
            .select(key_col)
        )
    else:
        cands = summaries.select(key_col).distinct()
    total = df.agg(F.count(F.lit(1)).alias("__n_total"))
    exact = (
        keyed
        .join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * denom > F.col("__n_total"))
        .select(
            F.when(F.col(key_col) == _NULL_SENTINEL, F.lit(None))
            .otherwise(F.col(key_col)).alias(key_col),
            "n_rows",
            F.col("__n_total").alias("n_total"),
        )
    )
