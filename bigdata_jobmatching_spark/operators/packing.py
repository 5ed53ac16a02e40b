"""First-fit-decreasing (FFD) sequence packing — the grouped-map
``applyInPandas`` operator.

The catalog's ``doc_sequence_packing`` is the SQL-expressible greedy
cumulative-sum packer (scan docs in order, cut when the running sum
crosses the budget). FFD packs tighter — sort items by size
descending, place each into the FIRST open pack it fits — and is the
standard bin-packing heuristic for training-batch construction
(guaranteed <= 11/9 OPT + 6/9 packs), but its inner loop carries
mutable per-pack state that neither window functions nor recursive
CTEs express: this is exactly the "imperative per-group logic"
case the grouped-map Pandas surface exists for (the only such batch
operator in this engine; everything SQL-expressible stays native).

Scale: the group is the unit of parallelism — one Arrow batch per
group lands in one Python worker. Groups here are corpus shards
(source, split, …) sized by upstream partitioning; the O(n·packs)
loop is bounded per group, and nothing about the operator needs a
second shuffle (the groupBy is the only exchange).

Determinism: items sort by (tokens DESC, id ASC) and packs are
scanned in creation order, so output is a pure function of the group
contents — independent of Arrow batch order, partitioning, and
engine version. Oversized items (tokens > budget) each get a
dedicated pack rather than erroring, so the operator is total.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ffd_pack(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Pack each group's items into packs of at most ``budget`` tokens
    via first-fit-decreasing. Returns one row per item:
    (group_cols..., id, tokens, pack_id, pack_fill) where ``pack_id``
    numbers packs within the group in creation order and
    ``pack_fill`` is the final token total of that pack."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    out_schema = ", ".join(
        [f"{c} string" for c in group_cols]
        + [f"{id_col} long", f"{tokens_col} long",
           "pack_id int", "pack_fill long"]
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        items = sorted(
            zip(pdf[id_col].astype("int64"), pdf[tokens_col].astype("int64")),
            key=lambda t: (-t[1], t[0]),
        )
        fills: list[int] = []
        assign: dict[int, int] = {}
        for doc_id, tok in items:
            placed = False
            if tok <= budget:
                for pi in range(len(fills)):
                    if fills[pi] + tok <= budget:
                        fills[pi] += tok
                        assign[doc_id] = pi
                        placed = True
                        break
            if not placed:  # no pack fits, or item itself oversized
                fills.append(tok)
                assign[doc_id] = len(fills) - 1
        head = pdf.iloc[0]
        return pd.DataFrame({
            **{c: str(head[c]) for c in group_cols},
            id_col: [d for d, _ in items],
            tokens_col: [t for _, t in items],
            "pack_id": [assign[d] for d, _ in items],
            "pack_fill": [fills[assign[d]] for d, _ in items],
        })

    return (
        df.select(*group_cols, id_col, tokens_col)
        .groupBy(*group_cols)
        .applyInPandas(pack_group, out_schema)
    )
