"""Temporal join operators the engine needs at crawl scale.

The reference has no joins at all (SURVEY.md section 2.2 — single-input
algorithm, `lib/RDFC10.js` consumes one dataset); these are the two
temporal shapes a web-crawl KG pipeline hits constantly and that Spark
lacks as named primitives:

* **as-of join** — attach "the most recent right-side row at or before
  this event" (crawl snapshot vs page fetch, entity version vs mention,
  price vs order).  Implemented shuffle-minimally as union + ONE window
  pass: both sides shuffle once on the join key, a single sort within
  each key, and ``last(..., ignorenulls=True)`` carries the right-side
  payload forward.  No range explosion, no broadcast-nested-loop — the
  plan is a single sort-merge-shaped Exchange+Sort+Window, which scales
  linearly with rows per key and is skew-safe for uniform keys.

* **band (range) self-join** — all pairs of events within a time
  window.  A naive theta-join (``abs(a.ts - b.ts) <= W``) degenerates
  to a per-key cross product; instead we bucket time into W-second
  cells and equi-join on ``(key, bucket)`` with the probe side exploded
  over bucket offsets {-1, 0, +1}.  Every qualifying pair has bucket
  delta in {-1, 0, 1}, and each (pair, delta) matches exactly one probe
  offset, so results are exact and duplicate-free with only a 3x row
  amplification on one side — the standard trick for interval joins at
  scale (same shape Flink/Beam use for interval joins).

Both have DuckDB oracles in ``__spark_entry__.oracle_sql`` (DuckDB's
native ASOF JOIN / inequality join respectively).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(left, right, key_left, key_right, ts_left, ts_right,
              payload_cols):
    """Generic as-of join: for each left row, the right row with the
    greatest ``ts_right`` <= ``ts_left`` for the same key (None columns
    when no such row).

    Right side must be unique per (key, ts) — pre-aggregate if not;
    ambiguity there is a data-model bug, not something to resolve
    silently.

    The payload is carried as ONE struct built only on right rows: the
    struct is non-null even when every field in it is null, so
    ``last(ignorenulls=True)`` always takes the whole matching row.
    Carrying each column independently would tear rows — a
    legitimately-NULL payload value in the matching right row would be
    replaced by a stale value from an older right row.
    """
    lcols = left.columns
    payload_t = right.select(
        F.struct(*payload_cols).alias("__payload")
    ).schema[0].dataType
    l = (
        left.withColumnRenamed(key_left, "__k")
        .withColumn("__ts", F.col(ts_left))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__payload", F.lit(None).cast(payload_t))
    )
    r = (
        right.withColumnRenamed(key_right, "__k")
        .withColumn("__ts", F.col(ts_right))
        .withColumn("__is_left", F.lit(0))
        .withColumn("__payload", F.struct(*payload_cols))
    )
    for c in lcols:
        if c not in (key_left,) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    keep = ["__k", "__ts", "__is_left", "__payload"] + [
        c for c in lcols if c != key_left
    ]
    u = l.select(*keep).unionByName(r.select(*keep))
    # Right rows sort before left rows at equal timestamps, making the
    # join inclusive (ts_left >= ts_right).  rowsBetween + last() is a
    # running carry-forward: one shuffle, one sort, no self-join.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(
        "__payload", F.last("__payload", ignorenulls=True).over(w)
    )
    return (
        u.filter(F.col("__is_left") == 1)
        .select(
            "*",
            *[F.col("__payload")[c].alias(c) for c in payload_cols],
        )
        .withColumnRenamed("__k", key_left)
        .drop("__ts", "__is_left", "__payload")
    )


def asof_last_order(events_df, orders_df):
    """Each event annotated with the user's most recent order at or
    before the event time (as-of join events x orders).

    Orders are pre-aggregated to one row per (custkey, orderdate) —
    max price — so the as-of target is deterministic.
    """
    best = orders_df.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_totalprice").alias("ord_price")
    ).select(
        "o_custkey",
        "o_orderdate",
        F.col("o_orderdate").alias("ord_date"),
        "ord_price",
    )
    out = asof_join(
        events_df.select("event_id", "user_id", "ts"),
        best,
        key_left="user_id",
        key_right="o_custkey",
        ts_left="ts",
        ts_right="o_orderdate",
        payload_cols=["ord_date", "ord_price"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ord_date").alias("last_order_date"),
        F.round("ord_price", 6).alias("last_order_price"),
    )


def close_event_pairs(events_df, window_seconds=60):
    """All pairs of events by the same user within ``window_seconds``
    of each other (band self-join), bucket-equi-join implementation.

    Exactly-once proof: for a qualifying pair (a, b) with bucket delta
    d = bucket(b) - bucket(a), |a.ts - b.ts| <= W implies d in
    {-1, 0, 1}; the probe (a) side is exploded over offsets {-1, 0, 1}
    and the equi-join matches only the probe row whose offset equals d.
    """
    e = events_df.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch"),
    ).withColumn(
        "bucket", F.floor(F.col("epoch") / F.lit(window_seconds))
    )
    probe = (
        e.withColumn(
            "off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
        )
        .select(
            "user_id",
            F.col("event_id").alias("event_a"),
            F.col("epoch").alias("epoch_a"),
            (F.col("bucket") + F.col("off")).alias("bucket"),
        )
    )
    build = e.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("epoch").alias("epoch_b"),
        "bucket",
    )
    return (
        probe.join(build, ["user_id", "bucket"])
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (
                F.abs(F.col("epoch_a") - F.col("epoch_b"))
                <= F.lit(window_seconds)
            )
        )
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.col("epoch_b") - F.col("epoch_a")).alias("dt_seconds"),
        )
    )
