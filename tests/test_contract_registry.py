"""Driver-contract registry invariants.

The driver's CORRECTNESS artifact samples a PREFIX of ``queries()``,
so the registry's ordering is load-bearing: the queries never captured
in a driver artifact through round 3 (plus round 4's new entry) must
stay in front until a driver artifact has recorded them.  Cheap
structural checks -- the semantic per-query verification is
tools/check_contract.py's job.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

# never in a driver CORRECTNESS artifact: the round-5 additions lead
# (the prior 70 are all green in CORRECTNESS_full_r04.json); the
# round-3/4 priority block follows
PRIORITY_PREFIX = [
    "entity_cooccurrence",
    "robots_rules",
    "robots_gate",
    "docs_quality_threshold",
    "docs_length_histogram",
    "url_blocklist",
    "docs_temperature_sample",
    "dedup_incremental",
    "media_ahash",
    "media_ahash_near_dups",
    "docs_bpe_merges",
    "docs_inverted_index",
    "docs_line_filter",
    "docs_bigram_ppl",
    "docs_source_profile",
    "dedup_containment_pairs",
    "docs_nfc_profile",
    "emb_kmeans_quantized",
    "docs_tfidf_keywords",
    "docs_unigram_ppl",
    "dedup_duplicate_spans",
    "dedup_span_stats",
    "dedup_remove_spans",
    "url_canonicalize",
    "url_dedup",
    "docs_dsir_weights",
    "docs_quality_gate",
    "docs_gate_histogram",
    "docs_build_vocab",
    "docs_oov_stats",
    "events_asof_orders",
    "events_close_pairs",
    "lineitem_quantiles",
    "events_pivot",
    "orders_cube",
    "customers_above_nation_avg",
    "embedding_norms",
    "entity_sharded_link",
    "entity_components",
    "entity_pagerank",
    "events_user_rolling",
    "text_word_udtf",
    "docs_geo_mean",
    "word_heavy_hitters",
    "lineitem_salted_join",
    "local_supplier_volume",
    "canonize_incremental",
    "ann_ivf_trained_topk",
    "text_repetition",
    "semantic_dedup",
]


def test_registry_shape_and_priority_prefix():
    qs = entrymod.queries()
    names = list(qs)
    assert len(names) == len(set(names)) == 100
    assert names[: len(PRIORITY_PREFIX)] == PRIORITY_PREFIX
    assert all(callable(fn) for fn in qs.values())


def test_every_query_has_an_oracle():
    """Repo invariant (CLAUDE.md): every operator carries an oracle
    entry -- rows-only checks would need a documented reason, and
    currently none exist."""
    qs = set(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert set(oracles) == qs
    assert all(
        isinstance(sql, str) and sql.strip().upper().startswith(
            ("SELECT", "WITH")
        )
        for sql in oracles.values()
    )
