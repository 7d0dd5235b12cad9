"""N-Quads file source and canonical N-Quads sink.

Source: each ``.nq`` file is one RDF dataset (one document).
``spark.read.text(..., wholetext=True)`` gives (path, content) rows;
parsing runs batched in Arrow with the same grammar/dedup semantics as
the reference parser (``rdfc.nquads.parse``), including the exact
``N-Quads parse error on line N.`` errors routed to an ``error``
column.

Sink: canonical per-document N-Quads back to text, plus a
single-file globally-sorted dump (explicit ``orderBy`` -- determinism
at dataset level only ever comes from an explicit sort).

At scale: file-granular parallelism (one task per file split), no
shuffle until/unless the caller groups; quad rows come out in the
standard flattened quad-table schema so every downstream operator
(dedup, canonize, relabel) composes.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..rdfc import nquads
from ..rdfc.terms import DEFAULT_GRAPH, LITERAL

QUAD_ROWS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("s_kind", IntegerType(), True),
        StructField("s", StringType(), True),
        StructField("p", StringType(), True),
        StructField("o_kind", IntegerType(), True),
        StructField("o", StringType(), True),
        StructField("o_datatype", StringType(), True),
        StructField("o_lang", StringType(), True),
        StructField("g_kind", IntegerType(), True),
        StructField("g", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def _null_row(url, error=None):
    return {
        "url": url, "s_kind": None, "s": None, "p": None,
        "o_kind": None, "o": None, "o_datatype": None, "o_lang": None,
        "g_kind": None, "g": None, "error": error,
    }


# Spark/Arrow strings are UTF-8: an unpaired surrogate (legal in the
# reference's UTF-16 JS strings, produced by \uD800-style escapes)
# cannot cross the Arrow boundary at all.  Documents containing one
# quarantine with a clear error instead of killing the task; the
# pure-Python API (rdfc.canonize) handles them reference-identically
# (pinned by the lone-surrogate-* goldens).
_SURROGATE_RE = re.compile(
    "[" + chr(0xD800) + "-" + chr(0xDFFF) + "]"
)
SURROGATE_ERROR = (
    "Unpaired surrogate in document: not representable in Spark "
    "string columns; canonize via the pure-Python API."
)


def _has_surrogate(dataset):
    for s, p, o, g in dataset:
        for v in (s[1], p[1], o[1], o[2], o[3], g[1]):
            if v and _SURROGATE_RE.search(v):
                return True
    return False


def _parse_batch(batches):
    for pdf in batches:
        out = []
        for url, content in zip(pdf["url"], pdf["content"]):
            try:
                dataset = nquads.parse(content)
            except nquads.NQuadsParseError as e:
                out.append(_null_row(url, str(e)))
                continue
            if _has_surrogate(dataset):
                out.append(_null_row(url, SURROGATE_ERROR))
                continue
            if not dataset:
                out.append(_null_row(url))
            for s, p, o, g in dataset:
                out.append(
                    {
                        "url": url,
                        "s_kind": s[0],
                        "s": s[1],
                        "p": p[1],
                        "o_kind": o[0],
                        "o": o[1],
                        "o_datatype": o[2] if o[0] == LITERAL else None,
                        "o_lang": o[3] if o[0] == LITERAL else None,
                        "g_kind": g[0],
                        "g": g[1],
                        "error": None,
                    }
                )
        yield pd.DataFrame(
            out,
            columns=[f.name for f in QUAD_ROWS_SCHEMA.fields],
        )


def read_nquads(spark, path):
    """Read a directory/glob of .nq files into the quad table.

    Returns rows with ``error`` set (and term columns null) for files
    that fail the grammar -- quarantine, not job failure.  Whitespace-
    only files produce a single null-term marker row (canonical form
    '').  NOTE: Spark's file sources skip 0-byte files entirely; a
    truly empty file is invisible to any file-based scan.
    """
    # binaryFile (not text/wholetext): represents 0-byte files and
    # avoids any line-splitting before the grammar sees the bytes
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.col("path").alias("url"),
            F.decode(F.col("content"), "UTF-8").alias("content"),
        )
    )
    return raw.mapInPandas(_parse_batch, QUAD_ROWS_SCHEMA)


def quad_rows(parsed_df):
    """The clean quad table (drops error/empty marker rows)."""
    return parsed_df.filter(
        F.col("error").isNull() & F.col("s_kind").isNotNull()
    ).drop("error")


def parse_errors(parsed_df):
    return parsed_df.filter(F.col("error").isNotNull()).select(
        "url", "error"
    )


def canonize_nquads_files(spark, path, max_work_factor=3):
    """End-to-end: .nq files -> per-file canonical N-Quads DataFrame
    (url, nquads, label_map, ..., error)."""
    from ..pipeline.canon_stage import canonize_documents

    parsed = read_nquads(spark, path)
    good = quad_rows(parsed)
    canonical = canonize_documents(
        good, max_work_factor=max_work_factor, strategy="repartition"
    )
    # carry parse failures through as quarantined rows
    errs = parse_errors(parsed).select(
        "url",
        F.lit(None).cast("string").alias("nquads"),
        F.lit(None).cast("map<string,string>").alias("label_map"),
        F.lit(None).cast("int").alias("n_quads"),
        F.lit(None).cast("int").alias("n_bnodes"),
        F.lit(None).cast("long").alias("deep_iterations"),
        F.lit(None).cast("string").alias("quads_hash"),
        "error",
        F.lit(None).cast("string").alias("input_hash"),
    )
    # empty files: canonical form is ''
    empties = (
        parsed.filter(F.col("error").isNull() & F.col("s_kind").isNull())
        .select(
            "url",
            F.lit("").alias("nquads"),
            F.expr("map()").cast("map<string,string>").alias("label_map"),
            F.lit(0).alias("n_quads"),
            F.lit(0).alias("n_bnodes"),
            F.lit(0).cast("long").alias("deep_iterations"),
            F.sha2(F.lit(""), 256).alias("quads_hash"),
            F.lit(None).cast("string").alias("error"),
            # input_hash over an empty row set = sha256 of the empty
            # digest concatenation (matches input_hash_of_rows([]))
            F.sha2(F.lit(""), 256).alias("input_hash"),
        )
    )
    return canonical.unionByName(errs).unionByName(empties)


def write_canonical_nquads(canonical_df, out_path, single_file=False):
    """Write per-document canonical N-Quads as text.

    ``single_file=True`` produces one globally-ordered file (explicit
    orderBy on url; coalesce(1) -- only for small exports)."""
    df = canonical_df.filter(F.col("nquads").isNotNull()).select(
        F.concat(
            F.lit("# "), F.col("url"), F.lit("\n"), F.col("nquads")
        ).alias("value")
    )
    if single_file:
        df = canonical_df.filter(
            F.col("nquads").isNotNull()
        ).orderBy("url").coalesce(1).select(F.col("nquads").alias("value"))
    df.write.mode("overwrite").text(out_path)
