"""Plan-shape assertions (the 100 TB contract) + streaming ingest."""

import pytest
from pyspark.sql import functions as F

from rdf_canonize_spark.pipeline.canon_stage import canonize_documents
from rdf_canonize_spark.pipeline.link import build_quads, gazetteer_df
from rdf_canonize_spark.pipeline.pages import synthesize_pages
from rdf_canonize_spark.plans import checks


def test_colocated_canonize_has_zero_shuffles(spark):
    pages = synthesize_pages(spark, 50)
    quads = build_quads(pages, gazetteer_df(spark))
    canon = canonize_documents(quads, max_work_factor=3)
    checks.assert_no_shuffle(canon, "colocated canonize")
    # generic strategy pays exactly one shuffle
    repart = canonize_documents(
        quads, max_work_factor=3, strategy="repartition"
    )
    assert checks.count_shuffles(repart) == 1


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    pushed = checks.pushed_filters(q)
    assert any("l_quantity" in p for p in pushed), pushed
    schemas = checks.read_schema(q)
    # column pruning: scan must not read all 11 lineitem columns
    assert schemas and all("l_shipdate" not in s for s in schemas)


def test_streaming_canonize_exactly_once(spark, tmp_path):
    from rdf_canonize_spark.streaming.ingest import start_canonize_stream

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "stream_out")
    synthesize_pages(spark, 40).repartition(8).write.parquet(in_dir)

    q = start_canonize_stream(spark, in_dir, out_dir)
    q.awaitTermination(timeout=300)

    got = spark.read.parquet(f"{out_dir}/canonical_nquads_stream")
    assert got.select("url").distinct().count() == 40
    assert got.count() == 40  # exactly-once: no duplicate urls
    assert got.filter("error is not null").count() == 0

    # restart with no new files: nothing reprocessed
    q2 = start_canonize_stream(spark, in_dir, out_dir)
    q2.awaitTermination(timeout=300)
    assert spark.read.parquet(
        f"{out_dir}/canonical_nquads_stream"
    ).count() == 40
