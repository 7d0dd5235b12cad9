"""Per-document RDFC-1.0 canonicalization as a grouped-map Arrow UDF.

``quads_df.groupBy('url').applyInPandas(...)`` -- each document's RDF
dataset canonicalizes independently and partition-parallel.  This is
the one stage that genuinely cannot be expressed in DataFrame algebra:
hash-n-degree-quads is sequential, stateful, recursive, and
data-dependent (see SURVEY.md O9), exactly what grouped-map UDFs are
for.  Everything around it stays in Catalyst.

Scale properties:

* state is strictly per-group -- no global index, no driver collect;
* a poison document raises inside its group only; the error is caught
  and routed to the ``error`` column (quarantine), never failing the
  job or stalling an executor (work budget enforced by max_work_factor);
* output is a pure function of the group's rows -- content-deterministic
  under re-partitioning (all reference-visible orderings are sorted);
* group size is bounded upstream (documents are pages, not the corpus);
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps Arrow batches.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..rdfc.canonize import RDFC10
from ..rdfc.terms import BLANK, DEFAULT_GRAPH, LITERAL, XSD_STRING

CANONICAL_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("nquads", StringType(), True),
        StructField("label_map", MapType(StringType(), StringType()), True),
        StructField("n_quads", IntegerType(), True),
        StructField("n_bnodes", IntegerType(), True),
        StructField("deep_iterations", LongType(), True),
        StructField("quads_hash", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def rows_to_dataset(rows):
    """Quad-table rows -> quad tuples with per-graph first-seen dedup
    (matching the reference N-Quads parse path, lib/NQuads.js:185-202)."""
    dataset = []
    seen = set()
    for (s_kind, s, p, o_kind, o, o_datatype, o_lang, g_kind, g) in rows:
        if o_kind == LITERAL:
            dt = o_datatype if o_datatype is not None else XSD_STRING
            obj = (LITERAL, o, dt, o_lang if o_lang else None)
        else:
            obj = (int(o_kind), o, None, None)
        quad = (
            (int(s_kind), s, None, None),
            (0, p, None, None),
            obj,
            (int(g_kind), "" if g_kind == DEFAULT_GRAPH else g, None, None),
        )
        key = (quad[0], quad[1], quad[2], quad[3][1])
        if key not in seen:
            seen.add(key)
            dataset.append(quad)
    return dataset


def make_canonize_fn(max_work_factor=3):
    """Build the grouped-map function (serialized to executors)."""

    cols = [
        "s_kind", "s", "p", "o_kind", "o",
        "o_datatype", "o_lang", "g_kind", "g",
    ]

    def canonize_group(key, pdf):
        url = key[0]
        rows = list(pdf[cols].itertuples(index=False, name=None))
        dataset = rows_to_dataset(rows)
        n_bnodes = len(
            {
                t[1]
                for q in dataset
                for t in (q[0], q[2], q[3])
                if t[0] == BLANK
            }
        )
        id_map = {}
        engine = RDFC10(
            canonical_id_map=id_map, max_work_factor=max_work_factor
        )
        try:
            nquads = engine.main(dataset)
            error = None
        except Exception as e:  # budget/timeout -> quarantine row
            nquads = None
            id_map = None
            error = str(e)
        quads_hash = hashlib.sha256(
            nquads.encode("utf-8", "surrogatepass")
        ).hexdigest() if nquads is not None else None
        return pd.DataFrame(
            [
                {
                    "url": url,
                    "nquads": nquads,
                    "label_map": id_map,
                    "n_quads": len(dataset),
                    "n_bnodes": n_bnodes,
                    "deep_iterations": engine.deep_iterations_used,
                    "quads_hash": quads_hash,
                    "error": error,
                }
            ]
        )

    return canonize_group


def canonize_documents(quads_df, max_work_factor=3, num_partitions=None):
    """quads -> canonical_nquads(url, nquads, label_map, ...).

    The ``groupBy('url')`` shuffle is the only data movement; url keys
    are high-cardinality and uniform (no hub skew -- entity skew lives
    on the entity side, handled in aggregations, not here).  An explicit
    ``repartition`` is available for clusters where group count must
    far exceed core count.
    """
    df = quads_df
    if num_partitions:
        df = df.repartition(num_partitions, "url")
    return df.groupBy("url").applyInPandas(
        make_canonize_fn(max_work_factor), CANONICAL_SCHEMA
    )
