"""Structured Streaming ingest for continuously-arriving pages.

The reference is strictly batch (SURVEY.md section 2.2) and the north
rule's resumability is manifest-based, but a crawl is naturally a
stream: this module runs the SAME pipeline incrementally --
``readStream`` over a pages directory, the per-batch transformation is
``run_pipeline``'s stages applied inside ``foreachBatch``, and Spark's
streaming checkpoint gives exactly-once per-batch file output.

``foreachBatch`` (not a continuous sink) because the canonize stage is
a grouped-map transform over a bounded batch -- each micro-batch is a
complete set of documents, so no watermark/state is needed: documents
are self-contained (url-keyed), the embarrassing-parallel case of
streaming.
"""

from __future__ import annotations

import os


def stream_pages(spark, in_dir, schema=None):
    """File-source stream of pages (one micro-batch per trigger)."""
    schema = schema or (
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )


def start_crawl_rate_stream(spark, in_dir, out_dir, window="10 minutes",
                            watermark="30 minutes"):
    """Watermarked windowed aggregation over the crawl stream:
    pages-per-(window, lang) with late-data tolerance.

    ``warc_ts`` is the event time; rows later than the watermark past
    the max seen event time are dropped from their window (standard
    late-data semantics).  Append mode: a window emits once final.
    """
    from pyspark.sql import functions as F

    pages = stream_pages(spark, in_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_chars",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "crawl_rate"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_rate_checkpoint")
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_canonize_stream(spark, in_dir, out_dir, max_work_factor=3):
    """pages stream -> canonical N-Quads parquet, exactly-once."""
    from ..pipeline.canon_stage import canonize_documents
    from ..pipeline.link import build_quads, gazetteer_df

    gaz = gazetteer_df(spark)
    pages = stream_pages(spark, in_dir)

    def process_batch(batch_df, batch_id):
        quads = build_quads(batch_df, gaz)
        canonical = canonize_documents(
            quads, max_work_factor=max_work_factor
        )
        (
            canonical.write.mode("append")
            .parquet(os.path.join(out_dir, "canonical_nquads_stream"))
        )

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
