"""Single-node head-to-head vs the reference implementation.

The SAME per-document N-Quads corpus (heavy synthetic pages ->
extract -> link -> serialize per url) is canonicalized three ways:

* the reference (node, one process, sequential awaits -- its only
  execution mode);
* this repo's pure-Python core (one process, sequential);
* (context) the Spark engine's end-to-end numbers from bench.py,
  which include extraction+linking and parallelize across cores.

Prints one JSON line with docs, quads, seconds and quads/s per side.
Usage: python3 tools/head2head.py [n_docs] [work_factor]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

NODE_RUNNER = """
const fs = require('fs');
const c = require('/root/reference/lib/index.js');
(async () => {
  const docs = JSON.parse(fs.readFileSync(process.argv[1], 'utf8'));
  // warm-up (JIT) on a copy of the first docs
  for (const nq of docs.slice(0, 50)) {
    await c.canonize(nq, {algorithm: 'RDFC-1.0',
      inputFormat: 'application/n-quads', maxWorkFactor: WF});
  }
  const t0 = process.hrtime.bigint();
  for (const nq of docs) {
    await c.canonize(nq, {algorithm: 'RDFC-1.0',
      inputFormat: 'application/n-quads', maxWorkFactor: WF});
  }
  const sec = Number(process.hrtime.bigint() - t0) / 1e9;
  process.stdout.write(JSON.stringify({sec}));
})();
"""


def build_corpus(n_docs):
    from pyspark.sql import functions as F

    from rdf_canonize_spark.operators.relational import serialize_line
    from rdf_canonize_spark.pipeline.link import build_quads, gazetteer_df
    from rdf_canonize_spark.pipeline.pages import synthesize_heavy_pages
    from rdf_canonize_spark.session import get_spark

    spark = get_spark(app_name="head2head-gen", master="local[8]",
                      shuffle_partitions=16)
    try:
        pages = synthesize_heavy_pages(spark, n_docs)
        quads = build_quads(pages, gazetteer_df(spark))
        docs = (
            serialize_line(quads)
            .groupBy("url")
            .agg(
                F.concat_ws(
                    "",
                    F.transform(
                        F.sort_array(F.collect_list("nq_line")),
                        lambda x: F.concat(x, F.lit(chr(10))),
                    ),
                ).alias("nq")
            )
            .collect()
        )
        return [r["nq"] for r in docs]
    finally:
        spark.stop()


def spark_canonize_rate(n_docs, wf, master, shuffle_partitions):
    """Canonize-stage throughput over a cached in-memory quad table
    (the symmetric task: quads in, canonical N-Quads out; the Spark
    side is spotted pre-parsed rows where the reference parses
    strings -- noted in the output).  Best of 2 warm runs."""
    from pyspark.sql import functions as F

    from rdf_canonize_spark.pipeline.canon_stage import canonize_documents
    from rdf_canonize_spark.pipeline.link import build_quads, gazetteer_df
    from rdf_canonize_spark.pipeline.pages import synthesize_heavy_pages
    from rdf_canonize_spark.session import get_spark

    spark = get_spark(app_name=f"head2head-{master}", master=master,
                      shuffle_partitions=shuffle_partitions)
    try:
        pages = synthesize_heavy_pages(spark, n_docs)
        quads = build_quads(pages, gazetteer_df(spark)).cache()
        n_quads = quads.count()  # materializes the cache
        df = canonize_documents(quads, max_work_factor=wf)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df.agg(F.count(F.lit(1))).collect()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        quads.unpersist()
        return best, n_quads
    finally:
        spark.stop()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    wf = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 60000

    corpus = build_corpus(n_docs)
    n_quads = sum(nq.count(chr(10)) for nq in corpus)

    # --- python core (sequential, one process) ---
    from rdf_canonize_spark.rdfc import canonize

    for nq in corpus[:50]:  # warm-up symmetry with the node side
        canonize(nq, algorithm="RDFC-1.0",
                 input_format="application/n-quads", max_work_factor=wf)
    t0 = time.perf_counter()
    for nq in corpus:
        canonize(nq, algorithm="RDFC-1.0",
                 input_format="application/n-quads", max_work_factor=wf)
    py_sec = time.perf_counter() - t0

    # --- reference (node, sequential) ---
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump(corpus, f)
        path = f.name
    try:
        out = subprocess.run(
            ["node", "-e", NODE_RUNNER.replace("WF", str(wf)), path],
            capture_output=True, check=True,
        )
        ref_sec = json.loads(out.stdout)["sec"]
    finally:
        os.unlink(path)

    # --- Spark canonize stage (same doc shape, larger corpus so task
    # scheduling amortizes; pre-parsed quad rows in, canonical out) ---
    s4_sec, s4_quads = spark_canonize_rate(spark_docs, wf, "local[4]", 8)
    s32_sec, s32_quads = spark_canonize_rate(
        spark_docs, wf, "local[32]", 64
    )

    print(json.dumps({
        "docs": n_docs,
        "quads": n_quads,
        "work_factor": wf,
        "reference_node_sec": round(ref_sec, 3),
        "reference_node_quads_per_sec": round(n_quads / ref_sec, 1),
        "python_core_sec": round(py_sec, 3),
        "python_core_quads_per_sec": round(n_quads / py_sec, 1),
        "core_vs_reference": round(ref_sec / py_sec, 3),
        "spark_docs": spark_docs,
        "spark_local4_quads_per_sec": round(s4_quads / s4_sec, 1),
        "spark_local32_quads_per_sec": round(s32_quads / s32_sec, 1),
        "spark_local32_vs_reference": round(
            (s32_quads / s32_sec)
            / (n_quads / ref_sec), 3),
    }))


if __name__ == "__main__":
    main()
