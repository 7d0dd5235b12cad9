"""The composed document-quality gate: one keep/drop verdict per
document from the whole filter ladder, C4/Gopher/CCNet style.

Training-data pipelines don't run filters in isolation -- they run a
LADDER and record, per document, whether it survives and WHICH rule
killed it (the reject histogram is the pipeline's main tuning
instrument).  ``quality_gate`` composes the repo's individual signal
operators -- length + quality score (``textstats.quality_score``),
language agreement (``textstats.lang_id``), Gopher repetition rules
(``textstats.repetition_stats``), and cross-document duplicate-span
coverage (``dedup.duplicate_span_stats``) -- into
``(doc_id, n_words, lang, lang_pred, quality, is_repetitive,
dup_word_frac, keep, reject_reason)`` with a FIXED rule order so the
first failing rule names the reason (deterministic cross-engine).

Scale shape: every signal frame is doc_id-keyed and |docs|-sized, so
the composition is three same-key joins that AQE plans as a single
shuffle stage each -- no new quadratic shape; the span stats reuse
the bounded gram pipeline.  All Catalyst, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .dedup import duplicate_span_stats
from .textstats import lang_id, quality_score, repetition_stats

GATE_MIN_WORDS = 25
GATE_MAX_WORDS = 100_000
GATE_MIN_QUALITY = 0.5
GATE_MAX_DUP_FRAC = 0.3

# fixed evaluation order: the first failing rule is the reject reason
GATE_RULES = ("length", "language", "quality", "repetition",
              "duplication")


def quality_gate(docs, min_words=GATE_MIN_WORDS,
                 max_words=GATE_MAX_WORDS,
                 min_quality=GATE_MIN_QUALITY,
                 max_dup_frac=GATE_MAX_DUP_FRAC):
    """Apply the full filter ladder to a ``(doc_id, lang, text)``
    frame.  Threshold comparisons run on the ROUNDED signal columns
    (the repo's cross-engine flag recipe), and the reason order is
    the GATE_RULES constant."""
    q = quality_score(docs).select("doc_id", "n_words", "quality")
    lid = lang_id(docs).select("doc_id", "lang_pred")
    rep = repetition_stats(docs).select("doc_id", "is_repetitive")
    dup = duplicate_span_stats(docs).select("doc_id", "dup_word_frac")
    base = (
        docs.select("doc_id", "lang")
        .join(q, "doc_id")
        .join(lid, "doc_id")
        .join(rep, "doc_id")
        .join(dup, "doc_id")
    )
    fail = {
        "length": (F.col("n_words") < min_words)
        | (F.col("n_words") > max_words),
        "language": F.col("lang_pred") != F.col("lang"),
        "quality": F.col("quality") < F.lit(float(min_quality)),
        "repetition": F.col("is_repetitive"),
        "duplication": F.col("dup_word_frac")
        > F.lit(float(max_dup_frac)),
    }
    reason = F.lit(None).cast("string")
    for rule in reversed(GATE_RULES):
        reason = F.when(fail[rule], F.lit(rule)).otherwise(reason)
    return base.select(
        "doc_id",
        "n_words",
        "lang",
        "lang_pred",
        "quality",
        "is_repetitive",
        "dup_word_frac",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def gate_histogram(gated):
    """The tuning artifact: documents per outcome.  ``reject_reason``
    NULL (kept) groups under 'kept'."""
    return (
        gated.groupBy(
            F.coalesce("reject_reason", F.lit("kept")).alias("outcome")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
