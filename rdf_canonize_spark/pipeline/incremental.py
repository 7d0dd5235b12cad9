"""Incremental recanonicalization for recrawls.

At 10^12 documents a daily recrawl changes a small fraction of pages;
recanonicalizing everything wastes the cluster.  Every canonize output
carries ``input_hash`` — a content hash of the document's input quads
(order-independent: hash of the sorted serialized quad lines) — and
``incremental_canonize`` joins the new crawl's hashes against the
prior output:

* unchanged url (same input_hash)  -> prior row carried forward,
  zero canonicalization work (correct because every per-url output is
  a pure function of the url's quads — the repartition-invariance
  property the tests pin);
* changed/new url                  -> canonized fresh;
* disappeared url                  -> dropped (not carried).

The join is url-keyed (high-cardinality, uniform — no skew handling
needed); the only full-corpus work in the unchanged path is the
input-hash aggregation, which is a map-side-combinable groupBy, not
the Arrow kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .canon_stage import canonize_documents

_COLS = ["s_kind", "s", "p", "o_kind", "o",
         "o_datatype", "o_lang", "g_kind", "g"]


def input_quads_hash(quads_df):
    """(url, input_hash): order-independent content hash of each
    document's quads.  NUL-coalesced unit-separator framing keeps
    null/empty distinctions; sort_array makes it row-order-invariant;
    duplicate quads collapse via collect_set (matching parse-time
    set semantics)."""
    line = F.concat_ws(
        chr(31), *[F.coalesce(F.col(c).cast("string"), F.lit(chr(0)))
                   for c in _COLS]
    )
    return (
        quads_df.select("url", line.alias("qline"))
        .groupBy("url")
        .agg(
            F.sha2(
                F.concat_ws("\n", F.sort_array(F.collect_set("qline"))),
                256,
            ).alias("input_hash")
        )
    )


def canonize_with_hash(quads_df, **kwargs):
    """Full canonize + input_hash column (the shape prior runs feed
    back into incremental_canonize)."""
    return canonize_documents(quads_df, **kwargs).join(
        input_quads_hash(quads_df), "url"
    )


def incremental_canonize(quads_df, prior_df, **kwargs):
    """Canonical output for the new crawl, recomputing only documents
    whose input quads changed since ``prior_df`` (a previous
    ``canonize_with_hash`` output).  Adds ``recomputed: boolean``.
    """
    hashes = input_quads_hash(quads_df)
    prior_hashes = prior_df.select(
        "url", F.col("input_hash").alias("prior_hash")
    )
    status = hashes.join(prior_hashes, "url", "left")
    unchanged_urls = status.filter(
        F.col("prior_hash") == F.col("input_hash")
    ).select("url")
    changed_urls = status.filter(
        F.col("prior_hash").isNull()
        | (F.col("prior_hash") != F.col("input_hash"))
    ).select("url")

    carried = prior_df.join(unchanged_urls, "url", "left_semi") \
        .withColumn("recomputed", F.lit(False))
    todo = quads_df.join(changed_urls, "url", "left_semi")
    fresh = canonize_with_hash(todo, **kwargs) \
        .withColumn("recomputed", F.lit(True))
    return fresh.unionByName(carried.select(*fresh.columns))
