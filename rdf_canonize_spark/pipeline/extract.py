"""Vectorized triple extraction from page text.

Two interchangeable engines (tested equal):

* ``extract_mentions`` -- pure Catalyst: ``regexp_extract_all`` +
  ``explode`` + ``split``.  Whole-stage-codegen JVM path; the default.
  This is the right engine whenever the mention pattern is regular --
  never burn Python cycles on what the JVM does vectorized.
* ``extract_mentions_arrow`` -- Arrow-batched ``pandas_udf`` doing the
  same detection over ``pd.Series``.  The extension point for
  non-regular detectors (gazetteer tries, ML scorers) mandated by the
  north rule ("batched mention detection ... vectorized Arrow UDFs");
  no per-row Python either way.

Output schema (mentions): ``url, s_surface, relation, o_surface, stmt_idx``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# one statement: "KG: <s> <rel> <o> ."
STATEMENT_PATTERN = r"KG: (\S+ \S+ \S+) \."


def extract_mentions(pages_df):
    """JVM-side extraction: regexp over `text`, exploded to one row per
    statement.  Column pruning: only (url, text) are read upstream."""
    stmts = pages_df.select(
        "url",
        F.posexplode(
            F.regexp_extract_all(
                "text", F.lit(STATEMENT_PATTERN), F.lit(1)
            )
        ).alias("stmt_idx", "stmt"),
    )
    parts = F.split(F.col("stmt"), " ")
    return stmts.select(
        "url",
        parts.getItem(0).alias("s_surface"),
        parts.getItem(1).alias("relation"),
        parts.getItem(2).alias("o_surface"),
        "stmt_idx",
    )


def _detect_statements_udf():
    # built lazily: pandas_udf type parsing needs an active session
    @pandas_udf("array<string>")
    def detect(text: pd.Series) -> pd.Series:
        """Arrow-batched detector: one regex pass per batch."""
        return text.str.findall(STATEMENT_PATTERN)

    return detect


def extract_mentions_arrow(pages_df):
    """Arrow-UDF extraction (same output as ``extract_mentions``)."""
    detect = _detect_statements_udf()
    stmts = pages_df.select(
        "url",
        F.posexplode(detect(F.col("text"))).alias("stmt_idx", "stmt"),
    )
    parts = F.split(F.col("stmt"), " ")
    return stmts.select(
        "url",
        parts.getItem(0).alias("s_surface"),
        parts.getItem(1).alias("relation"),
        parts.getItem(2).alias("o_surface"),
        "stmt_idx",
    )
