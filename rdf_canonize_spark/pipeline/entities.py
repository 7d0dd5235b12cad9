"""Cross-document entity canonicalization + skew-aware aggregation.

North-rule items: "links and canonicalizes entities" across documents
and "explicit salted repartitioning for skewed hub entities".

Entity keys are the skewed side of this workload: a handful of hub
entities (popular people/orgs) appear in a large fraction of documents
while the tail is sparse.  ``entity_degrees`` therefore aggregates in
two phases -- a salted partial aggregation that spreads each hot key
over ``n_salts`` reducers, then a cheap final combine over
``n_salts``-bounded rows per key.  AQE's skew handling does not apply
to aggregations (only joins), so the salt is explicit.

Results are salt-invariant by construction; the DuckDB oracle is a
plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..rdfc.terms import BLANK, NAMED


def entity_mentions(quads_df):
    """One row per NamedNode entity occurrence (subject or object),
    keeping the owning url.  Predicates/titles are not entities."""
    ent_ns = "http://kg.example.org/entity/"
    subs = quads_df.filter(
        (F.col("s_kind") == NAMED) & F.col("s").startswith(ent_ns)
    ).select("url", F.col("s").alias("entity"))
    objs = quads_df.filter(
        (F.col("o_kind") == NAMED) & F.col("o").startswith(ent_ns)
    ).select("url", F.col("o").alias("entity"))
    return subs.unionAll(objs)


def entity_degrees(quads_df, n_salts=16):
    """Global mention count + document frequency per entity via
    two-phase salted aggregation.

    Phase 1 groups on (entity, salt) where salt = hash(url) % n_salts
    -- a hub entity's rows split across n_salts reducers instead of
    hot-spotting one.  Phase 2 combines n_salts partials per entity.
    approx_distinct urls is counted exactly per salt-group then summed
    (url -> salt is a function, so salt groups partition the urls).
    """
    m = entity_mentions(quads_df).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    partial = m.groupBy("entity", "salt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("url").alias("docs"),
    )
    return partial.groupBy("entity").agg(
        F.sum("cnt").alias("n_mentions"),
        F.sum("docs").alias("n_docs"),
    )


def canonical_entity_map(quads_df):
    """Cross-document entity canonicalization: cluster surface variants
    (here: gazetteer entries sharing a name stem, e.g.
    ``Alice_Smith_000`` / ``Alice_Smith_100``) and pick the
    lexicographically-least member as the canonical IRI.

    Shape: groupBy(cluster_key) + min -- the canonical-entity
    dictionary this produces is small relative to the corpus and is
    broadcast back onto the quad table by ``canonicalize_entities``.
    """
    ents = entity_degrees(quads_df).select("entity")
    stem = F.regexp_replace(F.col("entity"), "_[0-9]+$", "")
    clustered = ents.withColumn("canonical_key", stem)
    return (
        clustered.groupBy("canonical_key")
        .agg(F.min("entity").alias("canonical_entity"))
        .join(clustered, "canonical_key")
        .select("entity", "canonical_key", "canonical_entity")
    )


def canonicalize_entities(quads_df, entity_map_df):
    """Rewrite entity IRIs in s/o to their canonical representatives.

    The dictionary folds to a single map row broadcast once (one
    nested-loop join of a 1-row build side); both the s and o rewrites
    are then map lookups.  Two broadcast hash joins would be no-shuffle
    too, but Spark plans the dictionary subtree (itself 3 shuffles —
    the salted aggregation) once PER join with no exchange reuse, so
    folding halves the dictionary computation; the quads side is never
    shuffled either way.  Valid while the dictionary fits one broadcast
    row (~the same bound as broadcasting it at all); above that, use
    operators/joins.py::sharded_broadcast_join per term instead.
    """
    one_row_map = entity_map_df.agg(
        F.map_from_entries(
            F.collect_list(F.struct("entity", "canonical_entity"))
        ).alias("canon_map")
    )
    j = quads_df.join(F.broadcast(one_row_map))
    s_canon = F.try_element_at(F.col("canon_map"), F.col("s"))
    o_canon = F.try_element_at(F.col("canon_map"), F.col("o"))
    return (
        j.withColumn("s_canon", s_canon)
        .withColumn("o_canon", o_canon)
        .select(
            "url",
            "s_kind",
            F.when(
                (F.col("s_kind") == NAMED) & F.col("s_canon").isNotNull(),
                F.col("s_canon"),
            ).otherwise(F.col("s")).alias("s"),
            "p",
            "o_kind",
            F.when(
                (F.col("o_kind") == NAMED) & F.col("o_canon").isNotNull(),
                F.col("o_canon"),
            ).otherwise(F.col("o")).alias("o"),
            "o_datatype",
            "o_lang",
            "g_kind",
            "g",
        )
    )
