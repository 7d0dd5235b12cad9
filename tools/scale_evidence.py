"""Two-cluster-size scaling evidence over a (derived) larger corpus.

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors.  No real cluster exists in the sandbox, so the same jobs
run at local[N] and local[4N] on the same input and the efficiency is
tput_4N / (4 * tput_N) -- the same protocol bench.py uses at sf0.1,
here pointed at the 10x derived corpus from gen_scaled_corpus.py to
show the plans and the scaling hold one decade up.

Parallelism choice (BASELINE.md sandbox caveat): the hypervisor's CPU
token bucket caps SUSTAINED parallelism at ~21 of 32 cores, so an
8-vs-32 comparison can never evidence 4x -- bench.py measures 1-vs-4
for the same reason.  Defaults here are 2 vs 8: both legs sit under
the cap, and 2 cores keeps the 10x corpus runs tractable.

Jobs measured end-to-end (noop sink, nothing collected):
* canonize  -- the flagship per-url RDFC-1.0 pipeline
* spans     -- exact-substring duplicate spans (round-5 op)
* dsir      -- DSIR importance weights (round-5 op)
(minhash over the 10x near-dup corpus is ~100M intermediate rows --
runnable via SPARK_GRAFT_SCALE_JOBS=minhash,... but not a default
leg; its shape is already covered at sf0.1 by bench/PLANS.)

Usage: python3 tools/scale_evidence.py [sf_dir] [n_small] [n_big]
Defaults: /tmp/sfx1 2 8.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cores):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scale-evidence-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        # At toy shuffle sizes AQE coalesces every exchange to 1-2
        # partitions (64 MB advisory target), serializing the
        # post-shuffle stages identically on BOTH legs -- scaling
        # reads as flat even though the plan is fine.  At production
        # shuffle sizes the advisory target yields >= cores
        # partitions and coalescing is pure win, so disabling it
        # HERE (measurement harness only) is the faithful setting.
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _jobs(spark, sf_dir):
    from rdf_canonize_spark.operators import dedup, sampling
    from rdf_canonize_spark.pipeline.canon_stage import canonize_documents
    from rdf_canonize_spark.pipeline.link import build_quads, gazetteer_df
    from rdf_canonize_spark.pipeline.pages import pages_from_documents

    def canonize():
        pages = pages_from_documents(spark, sf_dir)
        return canonize_documents(
            build_quads(pages, gazetteer_df(spark)), max_work_factor=3
        )

    def minhash():
        return dedup.minhash_signatures(dedup.near_dup_corpus(spark, sf_dir))

    def spans():
        return dedup.duplicate_spans(dedup.near_dup_corpus(spark, sf_dir))

    def dsir():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        return sampling.dsir_weights(docs)

    all_jobs = {"canonize": canonize, "minhash": minhash,
                "spans": spans, "dsir": dsir}
    sel = os.environ.get("SPARK_GRAFT_SCALE_JOBS", "canonize,spans,dsir")
    return {k: all_jobs[k] for k in sel.split(",") if k in all_jobs}


def run_at(cores, sf_dir):
    spark = _session(cores)
    out = {}
    try:
        jobs = _jobs(spark, sf_dir)
        n_docs = spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).count()
        for name, mk in jobs.items():
            _force(mk())  # warm (JIT + page cache); best-of-2 policy
            t0 = time.monotonic()
            _force(mk())
            out[name] = round(time.monotonic() - t0, 3)
        out["n_docs"] = n_docs
    finally:
        spark.stop()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # the same pre-flight idle-wait gate bench.py earned the hard way:
    # a drained hypervisor token bucket starves the BIG leg only (the
    # small leg fits under the drained cap), which reads as fake
    # anti-scaling.  Gate + measure effective cores around the runs.
    import bench

    pre_cores, pre_waited = bench.wait_for_healthy_bucket()
    small = run_at(n_small, sf_dir)
    mid_cores = bench.effective_cores_probe()
    big = run_at(n_big, sf_dir)
    post_cores = bench.effective_cores_probe()
    ratio = n_big / n_small
    eff = {
        k: round(small[k] / (ratio * big[k]), 3)
        for k in small
        if k != "n_docs" and big.get(k)
    }
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_docs": small["n_docs"],
        "cores_small": n_small,
        "cores_big": n_big,
        "wall_small": {k: v for k, v in small.items() if k != "n_docs"},
        "wall_big": {k: v for k, v in big.items() if k != "n_docs"},
        "efficiency_small_to_big": eff,
        "bucket": {
            "preflight_cores": pre_cores,
            "preflight_waited_sec": pre_waited,
            "cores_between_legs": mid_cores,
            "cores_after": post_cores,
            "healthy": post_cores >= max(14.0, float(n_big)),
        },
    }))


if __name__ == "__main__":
    main()
