"""Exact distributed heavy hitters: SpaceSaving candidates + recount.

At 100 TB the first question before any keyed shuffle is "which keys
are hot?" (they decide salting factors and broadcast eligibility).
Exact global counts of every key cost a full shuffle of the corpus;
this operator finds all keys with frequency > n * threshold EXACTLY:

1. per-partition SpaceSaving sketch with k = ceil(1/threshold)
   counters (``mapInPandas``, zero shuffle).  SpaceSaving guarantees
   any item with partition count > n_p/k is in the final table; a
   global heavy hitter has count > n*threshold >= n/k, so it exceeds
   n_p/k in at least one partition -- the candidate union is a strict
   superset of the true heavy hitters.
2. exact recount of candidates only: broadcast semi-join (the
   candidate set is <= k per partition) + groupBy over the filtered
   rows, then the global threshold filter.  The shuffle touches only
   rows whose key is a candidate, not the corpus.

Result is exact (not approximate), so it carries a plain SQL oracle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _spacesaving_partition(col, k):
    def sketch(batches):
        counters = {}
        for pdf in batches:
            # batch pre-aggregation: one weighted insert per distinct
            # value per Arrow batch, not per row
            for v, c in pdf[col].value_counts().items():
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    vm = min(counters, key=counters.get)
                    m = counters.pop(vm)
                    counters[v] = m + c
        yield pd.DataFrame({col: list(counters.keys())})

    return sketch


def heavy_hitters(df, col, threshold):
    """All values of ``col`` with count > ``df.count() * threshold``,
    with their exact counts.  Two passes over the data, one shuffle
    over only the candidate-keyed rows."""
    k = int(math.ceil(1.0 / threshold))
    field = df.schema[col]
    out_schema = StructType([StructField(col, field.dataType, True)])
    candidates = (
        df.select(col)
        .mapInPandas(_spacesaving_partition(col, k), out_schema)
        .distinct()
    )
    n_total = df.count()
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > F.lit(n_total * threshold))
    )
