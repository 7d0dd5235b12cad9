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


def _window_groups(line):
    """Top-level ``[...]`` argument groups of a ``Window`` plan line,
    WITH their contents.  The printed forms:

    * ``Window [exprs], [partitionSpec], [orderSpec]`` -- 3 groups
    * ``Window [exprs], [partitionSpec]`` -- partitionBy, no orderBy
    * ``Window [exprs], [orderSpec]``     -- orderBy, NO partitioning
    * ``Window [exprs]``                  -- neither

    The 2-group forms are distinguished by the sort markers order
    specs always print (``ASC NULLS``/``DESC NULLS``)."""
    start = line.find("Window ")
    if start < 0:
        return []
    depth = 0
    groups = []
    buf = []
    for ch in line[start + len("Window "):]:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def count_global_windows(df):
    """Number of Window operators with NO partition spec -- each one
    is a single-task sort of its whole input (WindowExec's 'No
    Partition Defined' warning).  Structurally fine only when the
    frame is provably tiny (e.g. a k-row candidate pool); the plan
    audit requires such cases to be footnoted (round-4 verdict
    action #7)."""
    plan = executed_plan(df)
    n = 0
    for line in plan.splitlines():
        if not re.search(r"\bWindow\b ", line):
            continue
        groups = _window_groups(line)
        if len(groups) <= 1:
            n += 1
        elif len(groups) == 2 and re.search(
            r"\b(ASC|DESC) NULLS", groups[1]
        ):
            n += 1
    return n
