"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (see README):

* AQE on -- runtime shuffle coalescing + skew-join splitting.
* Arrow on with a bounded ``maxRecordsPerBatch`` so a pathological
  document cannot blow executor memory inside ``applyInPandas``.
* ``shuffle.partitions`` sized per run (tests pass 32 to match the
  local[32] harness; a real cluster would use 2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name="rdf-canonize-spark",
    master=None,
    shuffle_partitions=None,
    extra_conf=None,
):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
