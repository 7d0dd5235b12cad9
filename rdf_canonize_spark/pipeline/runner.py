"""End-to-end KG-construction pipeline driver.

pages -> [extract: Catalyst regexp] -> mentions
      -> [link: broadcast gazetteer join] -> quads
      -> [canonize: groupBy(url).applyInPandas(RDFC-1.0)] -> canonical
      -> [materialize: edges/nodes/lineage/metrics (+ checkpointed writes)]

Control crosses the JVM<->Python boundary exactly once (the canonize
grouped-map UDF); everything else is whole-stage-codegen relational.
"""

from __future__ import annotations

from .canon_stage import canonize_documents
from .link import build_quads, gazetteer_df
from .materialize import (
    lineage_table,
    metrics_table,
    node_table,
    relabel_edges,
    resume_filter,
    write_batch,
)


def run_pipeline(
    spark,
    pages_df,
    max_work_factor=3,
    out_dir=None,
    batch_id=0,
    extract_fn=None,
    strategy="colocated",
):
    """Run the full pipeline; returns a dict of result DataFrames.

    With ``out_dir`` set, performs the checkpointed write (resuming past
    completed urls from the manifest).  ``strategy`` passes through to
    ``canonize_documents`` ('colocated' default; 'auto' applies the
    measured hybrid/kernel core-count crossover; 'hybrid' etc. as
    documented there).
    """
    gaz = gazetteer_df(spark)
    if out_dir:
        pages_df = resume_filter(spark, pages_df, out_dir)
    quads = build_quads(pages_df, gaz, extract_fn=extract_fn)
    if strategy == "hybrid":
        from .canon_stage import hybrid_canonize_documents

        canonical = hybrid_canonize_documents(
            quads, max_work_factor=max_work_factor
        )
    else:
        canonical = canonize_documents(
            quads, max_work_factor=max_work_factor, strategy=strategy
        )
    results = {
        "quads": quads,
        "canonical": canonical,
        "edges": relabel_edges(canonical, quads),
        "lineage": lineage_table(canonical, pages_df),
        "metrics": metrics_table(canonical),
    }
    results["nodes"] = node_table(results["edges"])
    if out_dir:
        # Emptiness (fully-resumed batch / all-null-text pages) is
        # decided INSIDE write_batch from the staged output -- the
        # pipeline evaluates exactly once, with no pre-probe scan.
        write_batch(canonical, out_dir, batch_id)
    return results
