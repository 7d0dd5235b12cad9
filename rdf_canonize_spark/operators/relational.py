"""Dataset-level relational analogues of the canonicalization stages.

The reference runs these steps per document inside one process; at
engine level each has a natural distributed form (SURVEY.md section 2
"Spark primitive it maps to").  These power the driver-contract
``queries()`` entries, each with a DuckDB oracle:

* O2  per-graph distinct            -> ``dedup_quads``
* O4  hash-first-degree (simplified) -> ``bnode_first_hash``
* O5  hash-group + unique detection -> ``hash_groups``
* O5b issue order (row_number)      -> ``issue_canonical_ids``
* O11 relabel via label-map join    -> ``relabel_quads``
* O13 global sort + concat          -> ``canonical_document``

The simplification vs the real algorithm: first-degree hashing here
serializes *without* the _:a/_:z substitution recursion (pure SQL can't
do n-degree).  That's why the real canonize stage is an Arrow UDF; these
analogues exist because at 100 TB you ALSO want the cheap SQL paths for
the 95%+ of documents whose bnodes are already unique by first-degree
hash (fast path), reserving the UDF for the rest.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..rdfc.terms import BLANK, LITERAL, NAMED


def serialize_line(df):
    """N-Quad line per row, Catalyst-only (named/blank subjects+objects,
    plain literals; datatype/lang handling mirrors the serializer)."""
    s_term = F.when(F.col("s_kind") == NAMED,
                    F.concat(F.lit("<"), F.col("s"), F.lit(">"))
                    ).otherwise(F.concat(F.lit("_:"), F.col("s")))
    o_term = (
        F.when(F.col("o_kind") == NAMED,
               F.concat(F.lit("<"), F.col("o"), F.lit(">")))
        .when(F.col("o_kind") == BLANK,
              F.concat(F.lit("_:"), F.col("o")))
        .otherwise(
            F.concat(
                F.lit('"'), F.col("o"), F.lit('"'),
                F.when(
                    F.col("o_lang").isNotNull(),
                    F.concat(F.lit("@"), F.col("o_lang")),
                ).otherwise(
                    F.when(
                        F.col("o_datatype").isNotNull()
                        & (F.col("o_datatype")
                           != "http://www.w3.org/2001/XMLSchema#string")
                        & (F.col("o_datatype")
                           != "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
                        F.concat(F.lit("^^<"), F.col("o_datatype"),
                                 F.lit(">")),
                    ).otherwise(F.lit(""))
                ),
            )
        )
    )
    return df.withColumn(
        "nq_line",
        F.concat(s_term, F.lit(" <"), F.col("p"), F.lit("> "), o_term,
                 F.lit(" .")),
    )


def dedup_quads(quads_df):
    """O2: per-(url, graph) set semantics via exact-match distinct."""
    return quads_df.select(
        "url", "s_kind", "s", "p", "o_kind", "o",
        "o_datatype", "o_lang", "g_kind", "g",
    ).distinct()


def bnode_first_hash(quads_df):
    """O4 (simplified, SQL-expressible): per (url, bnode), SHA-256 over
    the sorted concatenation of that bnode's incident serialized lines.

    Distributed shape: explode bnode positions -> shuffle on
    (url, bnode) -> sort_array(collect_list) -> sha2.  Map-side partial
    aggregation applies to collect_list; the sort is per-group.
    """
    lines = serialize_line(quads_df)
    # Single-shuffle shape: serialize each quad once, explode the row's
    # distinct bnode set, aggregate with collect_set.  Set semantics
    # absorb BOTH the quad-level dedup (O2) and the cross-position line
    # dedup, so the only exchange is the (url, bnode) groupBy (with
    # map-side partial aggregation).  The 3-branch union + two
    # distincts alternative costs three shuffles and three scans.
    cands = F.array_distinct(
        F.filter(
            F.array(
                F.when(F.col("s_kind") == BLANK, F.col("s")),
                F.when(F.col("o_kind") == BLANK, F.col("o")),
                F.when(F.col("g_kind") == BLANK, F.col("g")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        lines.select("url", "nq_line", F.explode(cands).alias("bnode"))
        .groupBy("url", "bnode")
        .agg(
            F.sha2(
                F.concat_ws("\n", F.sort_array(F.collect_set("nq_line"))),
                256,
            ).alias("first_hash"),
            F.size(F.collect_set("nq_line")).alias("n_lines"),
        )
    )


def bnode_first_degree_hash_exact(quads_df):
    """O4 EXACT in pure SQL: the real hash-first-degree-quads.

    Per (url, bnode): serialize each incident quad with the reference
    bnode replaced by ``_:a`` and every other bnode by ``_:z``
    (spec-bug semantics, lib/RDFC10Sync.js:414-428), sort the lines,
    SHA-256 the concatenation (each line keeps its trailing newline; no
    separator -- matching the incremental md.update framing).

    Valid whenever values need no N-Quads escaping and contain no
    astral characters (UTF-8 sort == UTF-16 sort then); on a web corpus
    that is the overwhelming majority -- this is the relational fast
    path for the unique-hash case, with the Arrow kernel as the
    general fallback.  Byte-parity with the Python kernel is asserted
    in tests.
    """
    q = dedup_quads(quads_df)
    # One scan, one extra shuffle total (the dedup): explode each
    # deduped quad over its distinct bnode set.  Unlike the simplified
    # variant, duplicate *serialized* lines from different quads must
    # be kept (the reference hashes per-quad, and distinct quads can
    # serialize identically after _:a/_:z substitution), so dedup
    # happens at quad level, not line level.
    cands = F.array_distinct(
        F.filter(
            F.array(
                F.when(F.col("s_kind") == BLANK, F.col("s")),
                F.when(F.col("o_kind") == BLANK, F.col("o")),
                F.when(F.col("g_kind") == BLANK, F.col("g")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    pairs = q.select("*", F.explode(cands).alias("bnode"))

    def subst(kind_col, val_col):
        return F.when(
            F.col(kind_col) == BLANK,
            F.when(F.col(val_col) == F.col("bnode"), F.lit("a"))
            .otherwise(F.lit("z")),
        ).otherwise(F.col(val_col))

    s_term = F.when(
        F.col("s_kind") == NAMED,
        F.concat(F.lit("<"), F.col("s"), F.lit(">")),
    ).otherwise(F.concat(F.lit("_:"), subst("s_kind", "s")))
    o_term = (
        F.when(F.col("o_kind") == NAMED,
               F.concat(F.lit("<"), F.col("o"), F.lit(">")))
        .when(F.col("o_kind") == BLANK,
              F.concat(F.lit("_:"), subst("o_kind", "o")))
        .otherwise(
            F.concat(
                F.lit('"'), F.col("o"), F.lit('"'),
                F.when(F.col("o_lang").isNotNull(),
                       F.concat(F.lit("@"), F.col("o_lang")))
                .otherwise(
                    F.when(
                        F.col("o_datatype").isNotNull()
                        & (F.col("o_datatype")
                           != "http://www.w3.org/2001/XMLSchema#string")
                        & (F.col("o_datatype")
                           != "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
                        F.concat(F.lit("^^<"), F.col("o_datatype"),
                                 F.lit(">")),
                    ).otherwise(F.lit(""))
                ),
            )
        )
    )
    # graph term: DefaultGraph adds nothing in this pipeline's quads
    g_term = F.when(
        F.col("g_kind") == NAMED,
        F.concat(F.lit(" <"), F.col("g"), F.lit(">")),
    ).when(
        F.col("g_kind") == BLANK,
        F.concat(F.lit(" _:"), subst("g_kind", "g")),
    ).otherwise(F.lit(""))
    line = F.concat(
        s_term, F.lit(" <"), F.col("p"), F.lit("> "), o_term, g_term,
        F.lit(" .\n"),
    )
    return (
        pairs.withColumn("fd_line", line)
        .groupBy("url", "bnode")
        .agg(
            F.sha2(
                F.concat_ws("", F.sort_array(F.collect_list("fd_line"))),
                256,
            ).alias("first_degree_hash")
        )
    )


# --- hybrid fast-path router ---------------------------------------------------
# Serialization-safety character classes (built with chr() arithmetic;
# see rdfc/nquads.py escape tables): a value that would trigger N-Quads
# escaping, or an astral character (UTF-16 code-unit sort != UTF-8
# binary sort), disqualifies its document from the relational path.
# Literal ECHAR/control set: [\x00-\x1F \x7F " \]
_LIT_UNSAFE = ("[" + chr(0) + "-" + chr(31) + chr(127) + chr(34)
               + chr(92) * 2 + "]")
# IRI escape set: [\x00-\x20 < > " { } | ^ ` \]
_IRI_UNSAFE = ("[" + chr(0) + "-" + chr(32) + "<>" + chr(34) + "{}|"
               + chr(94) + chr(96) + chr(92) * 2 + "]")
_ASTRAL = ("[" + chr(92) + "x{10000}-" + chr(92) + "x{10FFFF}]")
DEFAULT_GRAPH = 3


def _row_unsafe():
    """Row predicate: true when this quad cannot take the relational
    fast path (needs escaping, astral chars, a non-default graph, or
    an empty language tag the kernel would normalize to null)."""
    lit_unsafe = lambda c: F.coalesce(F.col(c), F.lit("")).rlike(_LIT_UNSAFE)
    iri_unsafe = lambda c: F.coalesce(F.col(c), F.lit("")).rlike(_IRI_UNSAFE)
    astral = F.concat_ws(
        "", *[F.coalesce(F.col(c), F.lit(""))
              for c in ("s", "p", "o", "o_datatype", "o_lang")]
    ).rlike(_ASTRAL)
    return (
        (F.col("g_kind") != DEFAULT_GRAPH)
        | ((F.col("s_kind") == NAMED) & iri_unsafe("s"))
        | iri_unsafe("p")
        | ((F.col("o_kind") == NAMED) & iri_unsafe("o"))
        | ((F.col("o_kind") == LITERAL)
           & (lit_unsafe("o")
              | (F.coalesce(F.col("o_lang"), F.lit("x")) == "")
              | lit_unsafe("o_lang")
              | iri_unsafe("o_datatype")
              # explicit xsd:string normalizes to null datatype in the
              # kernel; a doc mixing both forms of the same quad would
              # double-count lines in the relational exact-hash
              # aggregation -- route such docs to the kernel
              | (F.coalesce(F.col("o_datatype"), F.lit(""))
                 == "http://www.w3.org/2001/XMLSchema#string")
              # a language tag WITHOUT rdf:langString datatype: the
              # kernel normalizes null datatype to xsd:string and its
              # serializer then DROPS the tag, while serialize_line
              # would keep it -- byte divergence, route to the kernel
              | (F.col("o_lang").isNotNull()
                 & (F.coalesce(F.col("o_datatype"), F.lit(""))
                    != "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))))
        | astral
    )


def sql_eligible_urls(quads_df, fh=None):
    """Urls eligible for the pure-Catalyst canonicalization fast path:
    every quad is serialization-safe AND every blank node's EXACT
    first-degree hash is unique within the document (RDFC-1.0 then
    never enters n-degree hashing: canonical ids issue directly in
    first-degree-hash order).  On a web corpus this is the
    overwhelming majority of documents -- the 100x lever that keeps
    the Python kernel off the hot path.

    Shape: one map-side-combinable groupBy for safety + the exact-hash
    aggregation (itself 2 shuffles) + an aggregated uniqueness check;
    all shuffles carry url-keyed narrow rows.  Pass a precomputed
    ``fh`` (``bnode_first_degree_hash_exact`` output, possibly
    checkpointed) to share it with the issuance stage.
    """
    safety = (
        quads_df.select("url", _row_unsafe().cast("int").alias("u"))
        .groupBy("url")
        .agg((F.max("u") == 0).alias("safe"))
    )
    if fh is None:
        fh = bnode_first_degree_hash_exact(quads_df)
    dup_urls = (
        fh
        .groupBy("url", "first_degree_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("url")
        .distinct()
    )
    return (
        safety.filter(F.col("safe"))
        .join(dup_urls, "url", "left_anti")
        .select("url")
    )


def sql_canonize_documents(quads_df, fh=None):
    """RDFC-1.0 entirely in Catalyst, VALID ONLY for
    ``sql_eligible_urls`` documents: unique exact first-degree hashes
    mean canonical ids issue in hash order with no n-degree recursion,
    and serialization-safety means the simple serializer and binary
    sort are byte-identical to the kernel's escaped UTF-16 forms.
    Byte-equality with the Arrow kernel is asserted in tests.

    Output matches CANONICAL_SCHEMA exactly, ``input_hash`` included:
    the per-row framing digest rides through the relabel join and the
    hash folds into the SAME per-url aggregation as the canonical
    document -- no separate groupBy+join (framing is injective on the
    quad columns and the rollup collapses duplicate digests, so
    computing it on deduped rows equals the raw-row definition).

    ``fh`` may be the FULL corpus's exact-hash table even when
    ``quads_df`` is the eligible subset: the per-url hash is a pure
    function of that url's quads, and the output joins restrict to
    ``quads_df``'s urls.
    """
    from ..functions.framing import framed_line, input_hash_agg

    if fh is None:
        fh = bnode_first_degree_hash_exact(quads_df)
    w = Window.partitionBy("url").orderBy("first_degree_hash")
    ids = fh.select(
        "url",
        "bnode",
        F.concat(
            F.lit("c14n"), (F.row_number().over(w) - 1).cast("string")
        ).alias("cid"),
    )
    id_map = ids.groupBy("url").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bnode", "cid"))
        ).alias("label_map")
    )
    # No explicit distinct: duplicate raw rows serialize to identical
    # lines and frame to identical digests, and BOTH per-url
    # aggregations below are set-collapsing -- the O2 dedup falls out
    # of the aggregation for free (one fewer full-width shuffle).
    q = quads_df.withColumn("qh", F.sha2(framed_line(), 256))
    j = q.join(id_map, "url", "left")

    def sub(kind_col, val_col):
        repl = F.try_element_at(F.col("label_map"), F.col(val_col))
        return F.when(
            (F.col(kind_col) == BLANK) & repl.isNotNull(), repl
        ).otherwise(F.col(val_col))

    relabeled = j.select(
        "url",
        "s_kind",
        sub("s_kind", "s").alias("s"),
        "p",
        "o_kind",
        sub("o_kind", "o").alias("o"),
        "o_datatype",
        "o_lang",
        "g_kind",
        "g",
        "qh",
    )
    lines = serialize_line(relabeled)
    # collect_set: raw-distinct rows that NORMALIZE to the same quad
    # (datatype null vs xsd:string) collapse at line level, matching
    # the kernel's dataset dedup; within eligible docs serialization
    # is injective, so |distinct lines| == kernel n_quads.
    per_url = lines.groupBy("url").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_set("nq_line")),
                lambda x: F.concat(x, F.lit(chr(10))),
            ),
        ).alias("nquads"),
        F.size(F.collect_set("nq_line")).alias("n_quads"),
        input_hash_agg().alias("input_hash"),
    )
    out = per_url.join(id_map, "url", "left").select(
        "url",
        "nquads",
        F.coalesce(
            F.col("label_map"),
            F.expr("map()").cast("map<string,string>"),
        ).alias("label_map"),
        F.col("n_quads").cast("int").alias("n_quads"),
        "input_hash",
    )
    return out.select(
        "url",
        "nquads",
        "label_map",
        "n_quads",
        F.size("label_map").cast("int").alias("n_bnodes"),
        F.lit(0).cast("long").alias("deep_iterations"),
        F.sha2(F.col("nquads"), 256).alias("quads_hash"),
        F.lit(None).cast("string").alias("error"),
        "input_hash",
    )


def hash_groups(quads_df):
    """O5: group bnodes by first-degree hash; singleton groups are the
    'unique' fast path that skips n-degree work."""
    fh = bnode_first_hash(quads_df)
    return fh.groupBy("url", "first_hash").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list("bnode"))
        ).alias("members"),
        (F.count(F.lit(1)) == 1).alias("is_unique"),
    )


def issue_canonical_ids(quads_df):
    """O5b: issue c14n ids per url in first-degree-hash order
    (``row_number() over (partition by url order by hash, bnode)``)."""
    fh = bnode_first_hash(quads_df)
    w = Window.partitionBy("url").orderBy("first_hash", "bnode")
    return fh.select(
        "url",
        "bnode",
        "first_hash",
        F.concat(
            F.lit("c14n"), (F.row_number().over(w) - 1).cast("string")
        ).alias("canonical_id"),
    )


def relabel_quads(quads_df):
    """O11: rewrite blank-node labels to canonical ids.

    The issued-id table folds to ONE map per url (the groupBy reuses
    the issue-window's url partitioning, no extra exchange) and joins
    the quad table once on url; per-term rewriting is then a map
    lookup.  The two-wide-joins alternative (join on (url, s) then
    (url, o)) shuffles the quad table twice on different keys — 9
    exchanges total vs ~4 here, and the per-url map is exactly the
    label-map shape the canonize stage emits anyway.
    """
    ids = issue_canonical_ids(quads_df)
    id_map = ids.groupBy("url").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bnode", "canonical_id"))
        ).alias("c14n_map")
    )
    q = dedup_quads(quads_df)
    j = q.join(id_map, "url", "left")

    def sub(kind_col, val_col):
        repl = F.try_element_at(F.col("c14n_map"), F.col(val_col))
        return F.when(
            (F.col(kind_col) == BLANK) & repl.isNotNull(), repl
        ).otherwise(F.col(val_col))

    return j.select(
        "url",
        "s_kind",
        sub("s_kind", "s").alias("s"),
        "p",
        "o_kind",
        sub("o_kind", "o").alias("o"),
        "o_datatype",
        "o_lang",
        "g_kind",
        "g",
    )


def canonical_document(quads_df):
    """O13: per url, the sorted-concatenated canonical serialization of
    the relabeled quads (one output row per document)."""
    lines = serialize_line(relabel_quads(quads_df))
    return lines.groupBy("url").agg(
        F.concat_ws(
            "\n", F.sort_array(F.collect_list("nq_line"))
        ).alias("doc_nquads"),
        F.count(F.lit(1)).alias("n_lines"),
    )
