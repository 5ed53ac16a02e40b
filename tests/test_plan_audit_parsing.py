"""tools/plan_audit.py structural detectors (round 13).

The global-window rule and the unique-exchange census are plan-STRING
parsers; these tests pin their tree-walk semantics on synthetic plans
shaped like real executedPlan output, so a Spark print-format drift or
a refactor of the walker shows up as a test diff instead of a silently
green audit (the r12 lesson: the old `Window [...], []` regex never
matched anything partitionless and the audit stayed 'clean' while
three single-partition sorts shipped)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.plan_audit import unbounded_global_windows, _unique_exchanges


UNBOUNDED = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[decile#7], functions=[count(1)])
   +- Window [ntile(10) windowspecdefinition(price#3 ASC NULLS FIRST) AS decile#7], [price#3 ASC NULLS FIRST]
      +- Sort [price#3 ASC NULLS FIRST], false, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=19]
            +- FileScan parquet [price#3]
"""

LIMIT_BOUNDED = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() windowspecdefinition(x#1 ASC NULLS FIRST) AS rn#9], [x#1 ASC NULLS FIRST]
   +- Sort [x#1 ASC NULLS FIRST], false, 0
      +- GlobalLimit 25, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
            +- LocalLimit 25
               +- FileScan parquet [x#1]
"""

GROUP_LIMITED = """AdaptiveSparkPlan isFinalPlan=false
+- Filter (rn#9 <= 11)
   +- Window [row_number() windowspecdefinition(freq#2 DESC NULLS LAST) AS rn#9], [freq#2 DESC NULLS LAST]
      +- WindowGroupLimit [freq#2 DESC NULLS LAST], row_number(), 11, Final
         +- Sort [freq#2 DESC NULLS LAST], false, 0
            +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=31]
               +- WindowGroupLimit [freq#2 DESC NULLS LAST], row_number(), 11, Partial
                  +- Sort [freq#2 DESC NULLS LAST], false, 0
                     +- FileScan parquet [freq#2]
"""

PARTITIONED = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() windowspecdefinition(grp#1, x#2 ASC NULLS FIRST) AS rn#9], [grp#1], [x#2 ASC NULLS FIRST]
   +- Sort [grp#1 ASC NULLS FIRST, x#2 ASC NULLS FIRST], false, 0
      +- Exchange hashpartitioning(grp#1, 32), ENSURE_REQUIREMENTS, [plan_id=4]
         +- FileScan parquet [grp#1,x#2]
"""

# a window over an unrelated branch must not be blessed by a Limit in
# a SIBLING subtree (the walker only scans the window's own subtree)
SIBLING_LIMIT = """AdaptiveSparkPlan isFinalPlan=false
+- BroadcastHashJoin [k#1], [k#2], Inner, BuildRight, false
   :- Window [ntile(4) windowspecdefinition(v#3 ASC NULLS FIRST) AS b#9], [v#3 ASC NULLS FIRST]
   :  +- Sort [v#3 ASC NULLS FIRST], false, 0
   :     +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=11]
   :        +- FileScan parquet [k#1,v#3]
   +- BroadcastExchange HashedRelationBroadcastMode(List(k#2))
      +- GlobalLimit 5, 0
         +- FileScan parquet [k#2]
"""


# the AQE-materialized form: the gather is wrapped in a
# ShuffleQueryStage + AQEShuffleRead pair — the wrapper lines must be
# transparent or the inner SinglePartition reads as a benign second
# exchange and the single-task sort passes the audit
AQE_UNBOUNDED = """AdaptiveSparkPlan isFinalPlan=true
+- Window [ntile(10) windowspecdefinition(price#3 ASC NULLS FIRST) AS decile#7], [price#3 ASC NULLS FIRST]
   +- Sort [price#3 ASC NULLS FIRST], false, 0
      +- AQEShuffleRead coalesced
         +- ShuffleQueryStage 0
            +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=19]
               +- FileScan parquet [price#3]
"""


def test_unbounded_window_is_flagged():
    assert unbounded_global_windows(UNBOUNDED) == 1


def test_aqe_wrapped_unbounded_window_is_flagged():
    assert unbounded_global_windows(AQE_UNBOUNDED) == 1


def test_limit_bounded_window_passes():
    assert unbounded_global_windows(LIMIT_BOUNDED) == 0


def test_window_group_limit_passes():
    assert unbounded_global_windows(GROUP_LIMITED) == 0


def test_partitioned_window_passes():
    assert unbounded_global_windows(PARTITIONED) == 0


def test_sibling_limit_does_not_bless():
    assert unbounded_global_windows(SIBLING_LIMIT) == 1


# r13 advice: a Limit inside ONE BRANCH of a join below the window's
# gather does not bound the join's output (the other branch is
# data-proportional) — the spine scan must stop at the `:-` branch
# boundary instead of letting the branch Limit bless the window
BRANCH_LIMIT = """AdaptiveSparkPlan isFinalPlan=false
+- Window [ntile(4) windowspecdefinition(v#3 ASC NULLS FIRST) AS b#9], [v#3 ASC NULLS FIRST]
   +- Sort [v#3 ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=11]
         +- BroadcastHashJoin [k#1], [k#2], Inner, BuildLeft, false
            :- BroadcastExchange HashedRelationBroadcastMode(List(k#2))
            :  +- GlobalLimit 5, 0
            :     +- FileScan parquet [k#2]
            +- FileScan parquet [k#1,v#3]
"""


def test_branch_limit_does_not_bless():
    assert unbounded_global_windows(BRANCH_LIMIT) == 1


DUP_EXCHANGES = """AdaptiveSparkPlan isFinalPlan=false
+- SortMergeJoin [k#1], [k#45], Inner
   :- Sort [k#1 ASC NULLS FIRST], false, 0
   :  +- Exchange hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=10]
   :     +- FileScan parquet [k#1,v#2]
   +- Sort [k#45 ASC NULLS FIRST], false, 0
      +- Exchange hashpartitioning(k#45, 32), ENSURE_REQUIREMENTS, [plan_id=20]
         +- FileScan parquet [k#45,v#46]
"""

DISTINCT_EXCHANGES = """AdaptiveSparkPlan isFinalPlan=false
+- Union
   :- Exchange hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=10]
   :  +- FileScan parquet [k#1]
   +- Exchange hashpartitioning(k#2, 32), ENSURE_REQUIREMENTS, [plan_id=20]
      +- Project [m#3 AS k#2]
         +- FileScan parquet [m#3]
"""


def test_identical_exchange_subtrees_count_once():
    # a self-join's two sides differ only in expr/plan ids — Spark's
    # ReuseExchange runs ONE shuffle, so the census must count one
    shuffle, gather = _unique_exchanges(DUP_EXCHANGES)
    assert (shuffle, gather) == (1, 0)


def test_distinct_exchange_subtrees_count_separately():
    shuffle, gather = _unique_exchanges(DISTINCT_EXCHANGES)
    assert (shuffle, gather) == (2, 0)


def test_gather_counted_apart_from_shuffle():
    shuffle, gather = _unique_exchanges(UNBOUNDED)
    assert (shuffle, gather) == (0, 1)
