"""Join strategies for dimensions too large to broadcast whole.

SCALE.md: the entity gazetteer / canonical-entity dictionary at
10^8-10^9 entries (1-100 GB) exceeds executor broadcast comfort, but
shuffling the 100 TB fact side for a dimension join is the thing this
engine is built to avoid.  ``sharded_broadcast_join`` keeps the join
map-side: hash-partition the dimension into K shards, broadcast each
shard, and join the fact side filtered to the same hash class; the
union over shards equals the plain join because the hash classes
partition the key space.

Cost model: the fact side is scanned K times with its shard filter and
column pruning pushed down, instead of being hash-exchanged once in
full.  With a pruned scan of S bytes and full rows of R bytes per
shuffle, sharding wins when K*S < 2R (shuffle write + read) -- for the
mention projection (~3 narrow columns of ~4 KB pages) K=8 pruned scans
are ~50x cheaper than one full-row shuffle.  The fact side is NEVER
exchanged: the plan is K BroadcastHashJoins under a Union.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Spark accepts several aliases for the same join type; normalize so
# callers using 'leftouter'/'left_outer' (legitimate Spark spellings)
# aren't rejected by the inner/left safety allowlist.
_HOW_ALIASES = {"inner": "inner", "left": "left", "leftouter": "left"}


def _normalize_how(how, fn_name):
    canonical = _HOW_ALIASES.get(str(how).lower().replace("_", ""))
    if canonical is None:
        raise ValueError(
            f"{fn_name} supports inner/left joins only (replicated or "
            f"sharded dim side breaks right/full): got {how!r}"
        )
    return canonical


def _shard_class(col, n_shards):
    # xxhash64 of a null key is the seed (not null), but coalesce
    # anyway so left-join rows with null keys survive in shard 0.
    return F.coalesce(
        F.pmod(F.xxhash64(col), F.lit(n_shards)), F.lit(0)
    )


def sharded_broadcast_join(fact_df, dim_df, key, n_shards=4, how="left"):
    """Join ``fact_df`` to ``dim_df`` on ``key`` without ever shuffling
    the fact side, for dimensions above the broadcast threshold.

    Result is identical to ``fact_df.join(dim_df, key, how)`` for
    ``how`` in ('inner', 'left' and its Spark aliases): the shard
    classes partition the key space, so every matching pair lands in
    exactly one shard join.
    """
    how = _normalize_how(how, "sharded_broadcast_join")
    parts = []
    for i in range(n_shards):
        f = fact_df.filter(_shard_class(F.col(key), n_shards) == i)
        d = dim_df.filter(_shard_class(F.col(key), n_shards) == i)
        parts.append(f.join(F.broadcast(d), key, how))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def salted_join(fact_df, dim_df, key, n_salts=16, how="inner"):
    """Skew-safe equi-join: fact rows get a deterministic salt in
    [0, n_salts), the dim side is replicated n_salts times, and the
    join key becomes (key, salt) -- a hot key's rows spread over
    n_salts reducers instead of one.

    Use when BOTH sides are too large to broadcast and the key is
    skewed (AQE's skew-join split handles sort-merge skew only after
    materializing oversized partitions; salting bounds them up front).
    The salt is a hash of the whole fact row, so results are
    deterministic under repartitioning.  Replication cost: dim rows
    x n_salts -- size n_salts from the heavy-hitter counts
    (operators/sketches.py), not a guess.

    Only ``how`` in ('inner', 'left' incl. Spark's leftouter aliases)
    is equivalent to the plain join: for right/full joins the
    n_salts-times replicated dim side would emit every unmatched dim
    row n_salts times -- silently wrong, so rejected (same
    precondition sharded_broadcast_join enforces).
    """
    how = _normalize_how(how, "salted_join")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact_df.columns]),
        F.lit(n_salts),
    ).cast("int")
    f = fact_df.withColumn("__salt", salt)
    d = dim_df.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")
