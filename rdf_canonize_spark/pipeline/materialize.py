"""Graph materialization, lineage/metrics, checkpoint resumability.

Outputs (parquet in the sandbox; format='iceberg' on a real cluster --
the writer takes a ``fmt`` argument so the swap is one string):

* ``canonical_nquads(url, nquads, label_map, ...)`` -- per-document
  canonical form (the flagship output).
* ``nodes(term_kind, term, n_refs)`` -- distinct canonical terms.
* ``edges(url, s_kind, s, p, o_kind, o, g)`` -- canonically relabeled
  edge list.
* ``lineage(url, text_sha256, n_quads, deep_iterations, error)`` --
  per-document provenance incl. the byte-identical-text invariant hash.
* ``metrics(partition_id, n_urls, n_quads, n_errors, deep_iterations)``
  -- per-partition rollup.

Checkpoint/resume: each batch writes atomically into
``<out>/canonical_nquads/batch=<id>/`` and appends the completed url
range to ``<out>/_manifest`` parquet; ``resume_filter`` anti-joins
pages against the manifest so a restarted job only processes the
remainder.  (Batch-level resumability, not Structured Streaming -- the
reference pipeline is strictly batch, SURVEY.md section 2.2.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..rdfc.terms import BLANK


def relabel_edges(canonical_df, quads_df):
    """Canonically relabeled edge list.

    Joins the quad table against the per-url blank-node label maps.  The
    join key is url (co-partitioned with the canonize shuffle); label
    substitution is a map lookup, not a second join.
    """
    maps = canonical_df.select("url", "label_map")
    joined = quads_df.join(maps, "url", "left")

    def relabel(kind_col, val_col):
        canonical = F.col("label_map")[F.col(val_col)]
        return (
            F.when(
                (F.col(kind_col) == BLANK) & canonical.isNotNull(),
                canonical,
            )
            .otherwise(F.col(val_col))
        )

    return joined.select(
        "url",
        F.col("s_kind"),
        relabel("s_kind", "s").alias("s"),
        F.col("p"),
        F.col("o_kind"),
        relabel("o_kind", "o").alias("o"),
        F.col("g"),
    )


def node_table(edges_df):
    """Distinct canonical terms with reference counts (partial agg is
    map-side; one shuffle on the term).

    Blank nodes are document-scoped, so they are skolemized with the
    owning url (``<url>#_:c14nN``) -- otherwise every document's
    ``c14n0`` would merge into one false hub node.
    """

    def skolem(kind_col, val_col):
        return F.when(
            F.col(kind_col) == BLANK,
            F.concat(F.col("url"), F.lit("#_:"), F.col(val_col)),
        ).otherwise(F.col(val_col))

    s_nodes = edges_df.select(
        F.col("s_kind").alias("term_kind"),
        skolem("s_kind", "s").alias("term"),
    )
    o_nodes = edges_df.select(
        F.col("o_kind").alias("term_kind"),
        skolem("o_kind", "o").alias("term"),
    )
    return (
        s_nodes.unionAll(o_nodes)
        .groupBy("term_kind", "term")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )


def lineage_table(canonical_df, pages_df):
    """Per-document lineage; ``text_sha256`` is the byte-identical
    extracted-text invariant from the north rule."""
    text_hash = pages_df.select(
        "url", F.sha2(F.col("text"), 256).alias("text_sha256")
    )
    return canonical_df.join(text_hash, "url", "left").select(
        "url", "text_sha256", "n_quads", "n_bnodes",
        "deep_iterations", "quads_hash", "error",
    )


def metrics_table(canonical_df):
    """Per-partition rollup (executor-local partial agg, tiny result)."""
    return (
        canonical_df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum("n_quads").alias("n_quads"),
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).alias("n_errors"),
            F.sum("deep_iterations").alias("deep_iterations"),
        )
    )


# --- checkpointed batch writes -------------------------------------------------
def manifest_path(out_dir):
    return os.path.join(out_dir, "_manifest")


def resume_filter(spark, pages_df, out_dir):
    """Drop pages already present in the completion manifest."""
    mpath = manifest_path(out_dir)
    try:
        done = spark.read.parquet(mpath).select("url")
    except Exception:
        return pages_df  # no manifest yet -> full input
    return pages_df.join(done, "url", "left_anti")


def write_batch(canonical_df, out_dir, batch_id, fmt="parquet",
                nonempty_hint=None):
    """Atomic batch write + manifest append.

    Spark's committer makes the per-batch directory atomic; the manifest
    row is appended only after the data write succeeds, so a crash
    between the two re-processes (idempotent overwrite), never skips.

    ``nonempty_hint``: a fully-resumed batch has an empty todo set, and
    overwriting then would wipe the completed batch's data while the
    manifest still lists its urls as done (permanent loss).  Callers
    that already know emptiness from a CHEAP frame (run_pipeline checks
    the post-resume pages set) pass True/False and skip the guard; with
    the default None the guard evaluates ``canonical_df.limit(1)``,
    which runs the Arrow kernel for at least one partition -- safe but
    double work on the normal path.
    """
    spark = canonical_df.sparkSession
    data_path = os.path.join(out_dir, "canonical_nquads", f"batch={batch_id}")
    if nonempty_hint is False:
        return
    if nonempty_hint is None and canonical_df.limit(1).count() == 0:
        return
    canonical_df.write.mode("overwrite").format(fmt).save(data_path)
    done_urls = spark.read.format(fmt).load(data_path).select("url")
    done_urls.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "append"
    ).format(fmt).save(manifest_path(out_dir))
