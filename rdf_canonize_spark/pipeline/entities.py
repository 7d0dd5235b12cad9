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


COOC_MAX_DOC_ENTITIES = 64
COOC_MIN_COUNT = 2


def entity_cooccurrence(quads_df, max_doc_entities=COOC_MAX_DOC_ENTITIES,
                        min_count=COOC_MIN_COUNT):
    """Entity co-occurrence graph with PMI scores -- the KG-side
    relatedness signal (link prediction priors, disambiguation
    context, graph embeddings input): for every pair of entities
    mentioned in the same document, ``pmi = ln(c_ab * N / (c_a *
    c_b))`` over document frequencies, integerized to micro-nats
    (``floor(1e6 * ln)``, the repo's idf recipe) so scores are
    integer-exact cross-engine.  Output ``(entity_a, entity_b, c_ab,
    pmi_micro)`` with ``entity_a < entity_b`` and ``c_ab >=
    min_count``.

    Scale shape: the within-document pair join is the only quadratic
    surface, and it is bounded BEFORE the join by dropping documents
    mentioning more than ``max_doc_entities`` distinct entities (a
    mega-list page is low-signal for PMI anyway -- the standard
    windowing argument), so a document contributes at most
    ``max_doc_entities^2`` pair rows.  Marginals and the document
    count come from the SAME capped mention set, keeping PMI
    internally consistent; the mention set is localCheckpointed (3
    consumers).  Entity keys are Zipfian (hub entities) -- the pair
    aggregate is the AQE skew case, same note as the token joins."""
    dm = entity_mentions(quads_df).distinct()
    sizes = dm.groupBy("url").agg(F.count(F.lit(1)).alias("n_ents"))
    kept = dm.join(
        sizes.filter(F.col("n_ents") <= max_doc_entities).select("url"),
        "url",
    ).localCheckpoint()
    a = kept.select("url", F.col("entity").alias("entity_a"))
    b = kept.select("url", F.col("entity").alias("entity_b"))
    pairs = (
        a.join(b, "url")
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    marg = kept.groupBy("entity").agg(F.count(F.lit(1)).alias("c"))
    tot = kept.agg(F.countDistinct("url").alias("nd"))
    return (
        pairs.join(
            marg.select(F.col("entity").alias("entity_a"),
                        F.col("c").alias("c_a")),
            "entity_a",
        )
        .join(
            marg.select(F.col("entity").alias("entity_b"),
                        F.col("c").alias("c_b")),
            "entity_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "entity_a",
            "entity_b",
            "c_ab",
            F.floor(
                F.log(
                    (F.col("c_ab") * F.col("nd")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                )
                * 1e6
            ).cast("long").alias("pmi_micro"),
        )
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
