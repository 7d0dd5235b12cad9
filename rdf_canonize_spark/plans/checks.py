"""Physical-plan inspection utilities.

At 100 TB the difference between a good and a bad plan is the job, so
plan shape is asserted in tests, not hoped for:

* ``count_shuffles`` / ``assert_no_shuffle`` -- shuffle exchanges
  (broadcast exchanges excluded: broadcasting a dimension is the
  point, not a cost).
* ``pushed_filters`` / ``read_schema`` -- did predicates and column
  pruning reach the parquet scan?
* ``codegen_spans`` -- how much of the plan runs in whole-stage
  codegen.
"""

from __future__ import annotations

import re


def executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(df):
    """Shuffle exchanges only (BroadcastExchange is not data movement
    of the fact table)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)",
                          plan))


def assert_no_shuffle(df, context=""):
    n = count_shuffles(df)
    if n:
        raise AssertionError(
            f"expected zero shuffles{' in ' + context if context else ''}, "
            f"found {n}:\n{executed_plan(df)}"
        )


def pushed_filters(df):
    """PushedFilters entries from the scan nodes."""
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema(df):
    plan = executed_plan(df)
    return re.findall(r"ReadSchema: ([^\n,]+)", plan)


def codegen_spans(df):
    plan = executed_plan(df)
    return plan.count("WholeStageCodegen")
