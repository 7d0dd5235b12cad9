"""Catalyst-only vector column functions (no UDFs, JVM-side).

The embedding column is ``array<float>``; all arithmetic is done in
DOUBLE after an explicit cast so Spark and the DuckDB oracle agree
bit-for-bit at 6 significant digits (CLAUDE.md oracle-parity recipe).

``F.aggregate`` is a left fold in array order — the same evaluation
order DuckDB's ``list_sum(list_transform(...))`` uses — so no
reassociation drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def as_double(col):
    """array<float> -> array<double> (do all math in double)."""
    return F.col(col).cast("array<double>") if isinstance(col, str) else \
        col.cast("array<double>")


def dot(a, b):
    """Dot product of two array<double> columns (zip_with + fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    """Cosine similarity; null-safe for zero vectors (ANSI /0 guard)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def embedding_norms(emb_df):
    """Per-vector dimensionality + L2 norm over the embeddings table."""
    v = as_double("embedding")
    return emb_df.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(l2_norm(v), 6).alias("l2_norm"),
    )
