"""Triple-agreement (precision/recall) gate.

North rule: "matching the reference's emitted (subj, pred, obj)
triples (P/R >= 0.95)".  The reference implementation emits no triples
(it canonizes an existing dataset), so the agreement target is the
ground-truth statement set of the synthetic corpus -- computed here by
a SECOND, independent Spark path (closed-form arithmetic over doc
keys; no regex, no text) and compared against what the real pipeline
(text render -> regex extract -> link) emits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..rdfc.terms import BLANK, NAMED
from .gazetteer import (
    N_KNOWN,
    entity_iri,
    predicate_iri,
    RELATIONS,
    SURFACES,
)


def expected_triples(spark, keys_df):
    """Ground-truth (url, s_kind, s, p, o_kind, o) per doc key --
    arithmetic only, never touching the rendered text."""
    surf = F.array(*[F.lit(s) for s in SURFACES])
    rel = F.array(*[F.lit(predicate_iri(r)) for r in RELATIONS])
    iri = F.array(*[F.lit(entity_iri(s)) for s in SURFACES])

    exploded = keys_df.select(
        "k",
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.col("k"), F.lit(5)).cast("int"))
        ).alias("i"),
    )
    s_idx = F.pmod(F.col("k") * 7 + F.col("i") * 13, F.lit(200)).cast("int")
    o_idx = F.pmod(
        F.col("k") * 11 + F.col("i") * 17 + 3, F.lit(200)
    ).cast("int")
    r_idx = F.pmod(F.col("k") + F.col("i"), F.lit(8)).cast("int")
    return exploded.select(
        F.expr(
            "concat('https://crawl.example.org/p/', "
            "lpad(cast(k as string), 12, '0'))"
        ).alias("url"),
        F.when(s_idx < N_KNOWN, F.lit(NAMED)).otherwise(F.lit(BLANK))
        .alias("s_kind"),
        F.when(
            s_idx < N_KNOWN, F.element_at(iri, s_idx + 1)
        ).otherwise(F.element_at(surf, s_idx + 1)).alias("s"),
        F.element_at(rel, r_idx + 1).alias("p"),
        F.when(o_idx < N_KNOWN, F.lit(NAMED)).otherwise(F.lit(BLANK))
        .alias("o_kind"),
        F.when(
            o_idx < N_KNOWN, F.element_at(iri, o_idx + 1)
        ).otherwise(F.element_at(surf, o_idx + 1)).alias("o"),
    ).distinct()


def precision_recall(emitted_df, expected_df):
    """Set P/R over (url, s_kind, s, p, o_kind, o)."""
    cols = ["url", "s_kind", "s", "p", "o_kind", "o"]
    emitted = emitted_df.select(*cols).distinct().cache()
    expected = expected_df.select(*cols).distinct().cache()
    tp = emitted.join(expected, cols).count()
    n_emitted = emitted.count()
    n_expected = expected.count()
    return {
        "true_positives": tp,
        "emitted": n_emitted,
        "expected": n_expected,
        "precision": tp / n_emitted if n_emitted else 0.0,
        "recall": tp / n_expected if n_expected else 0.0,
    }


def pipeline_agreement(spark, sf_dir):
    """Run the real pipeline's extraction and score it against the
    independent ground truth."""
    from .link import build_quads, gazetteer_df
    from .pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    quads = build_quads(pages, gazetteer_df(spark))
    emitted = quads.filter(
        ~F.col("p").endswith("/title")
    )  # statement triples only (titles are synthesized, not extracted)
    keys = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("k"))
    )
    return precision_recall(emitted, expected_triples(spark, keys))
