"""Deterministic sampling / dataset-mixing operators.

A training-data pipeline re-samples and re-weights sources constantly;
at 100 TB the sample must be (a) deterministic under repartitioning
and re-runs, (b) a narrow map or a bounded window -- never a global
sort or a random() that breaks reproducibility.  Both operators key on
md5(doc_id) -- engine-portable (identical lowercase hex in Spark and
DuckDB, CLAUDE.md parity recipes) and uniform, so rates hold per
stratum.

* ``stratified_sample`` -- per-stratum Bernoulli sampling with a
  deterministic hash threshold: keep iff the first 8 hex chars of
  md5(doc_id) compare below the rate's zero-padded hex threshold
  (string comparison == numeric comparison on fixed-width hex).
  Zero-shuffle: pure filter, pushdown-friendly.
* ``source_mix_quota`` -- exact per-source quotas (dataset mixing):
  rank docs within each stratum by (md5, doc_id) and keep the first
  ``quota[stratum]``.  One shuffle (the stratum window); the rank
  order is the hash order, i.e. a deterministic shuffle of each
  stratum, so the quota takes a uniform sample, not a prefix.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def rate_threshold(rate):
    """rate in [0,1] -> 8-hex-char threshold, zero-padded.  rate >= 1
    returns 'g' (lexicographically above every hex bucket) so a full
    sample keeps ALL rows -- clamping to 'ffffffff' exclusive would
    silently drop docs whose bucket is exactly ffffffff."""
    if rate >= 1.0:
        return "g"
    n = max(0, min(int(round(rate * 16 ** 8)), 16 ** 8 - 1))
    return format(n, "08x")


def _bucket(col="doc_id"):
    return F.substring(F.md5(F.col(col).cast("string")), 1, 8)


def stratified_sample(docs, rates, stratum_col="lang"):
    """``rates``: dict stratum -> rate; strata absent from the dict
    are dropped.  Output keeps (doc_id, stratum, bucket) for
    auditability."""
    # CASE chain built in deterministic key order
    thr = F.lit(None).cast("string")
    for stratum, rate in sorted(rates.items(), reverse=True):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    b = _bucket()
    return (
        docs.select(
            "doc_id", F.col(stratum_col).alias("stratum"),
            b.alias("bucket"), thr.alias("thr"),
        )
        .filter(F.col("thr").isNotNull() & (F.col("bucket") < F.col("thr")))
        .drop("thr")
    )


def source_mix_quota(docs, quotas, stratum_col="lang"):
    """``quotas``: dict stratum -> exact row quota.  Output
    (doc_id, stratum, mix_rank) with mix_rank <= quota[stratum]."""
    q = F.lit(None).cast("int")
    for stratum, quota in sorted(quotas.items(), reverse=True):
        q = F.when(
            F.col(stratum_col) == stratum, F.lit(int(quota))
        ).otherwise(q)
    w = Window.partitionBy(stratum_col).orderBy(
        _bucket(), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", F.col(stratum_col),
            F.row_number().over(w).alias("mix_rank"), q.alias("quota"),
        )
        .filter(F.col("quota").isNotNull()
                & (F.col("mix_rank") <= F.col("quota")))
        .select(
            "doc_id", F.col(stratum_col).alias("stratum"), "mix_rank"
        )
    )


TEMP_TARGET_FRAC = 0.5


def temperature_sample(docs, target_frac=TEMP_TARGET_FRAC,
                       source_col="source"):
    """Temperature-based source mixing (the multilingual-pretraining
    re-balancing rule, Conneau & Lample 2019 / mT5: sample sources
    proportional to ``n_s^alpha`` with alpha = 0.5, up-weighting rare
    sources): given a global budget of ``target_frac * N`` documents,
    source ``s`` gets a per-doc keep probability
    ``k_s = min(1, target_frac * N * q_s / n_s)`` with
    ``q_s = w_s / W``, ``w_s = floor(1e6 * sqrt(n_s))``.  Output
    ``(doc_id, source, bucket, k_micro)`` for the kept docs.

    Every quantity is integerized so the sample is bit-identical
    cross-engine: sqrt is IEEE correctly-rounded on both engines,
    weights floor to micro units, and the keep probability is an
    exact integral division of DECIMAL(38,0)/HUGEINT products
    (pinned equal to DuckDB ``//``).  Selection reuses the
    hash-threshold recipe of ``stratified_sample``: keep iff the
    md5(doc_id) 8-hex bucket sorts below the per-source threshold
    ('g' = keep-all when k saturates).

    Scale shape: one source-keyed count aggregate (map-side
    combinable) + a 1-row totals broadcast + a probability-table
    broadcast join (source-cardinality rows; bucket it instead if
    sources are full domains at 100 TB) + a pure filter -- the fact
    side is never shuffled."""
    t_micro = int(round(target_frac * 1e6))
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        source_col,
        "n",
        F.floor(F.sqrt(F.col("n")) * 1e6).cast("long").alias("w"),
    )
    tot = counts.agg(
        F.sum("w").alias("tw"), F.sum("n").alias("tn")
    )
    k = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.lit(1000000).cast("long"),
                F.expr(
                    f"(CAST({t_micro} AS DECIMAL(38,0)) * tn * w)"
                    " div (CAST(tw AS DECIMAL(38,0)) * n)"
                ),
            ).alias("k_micro"),
        )
        .select(
            source_col,
            "k_micro",
            F.when(F.col("k_micro") >= 1000000, F.lit("g"))
            .otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.expr(
                                "(k_micro * 4294967296) div 1000000"
                            )
                        )
                    ),
                    8,
                    "0",
                )
            )
            .alias("thr"),
        )
    )
    b = _bucket()
    return (
        docs.select("doc_id", source_col, b.alias("bucket"))
        .join(F.broadcast(k), source_col)
        .filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", F.col(source_col).alias("source"),
                "bucket", "k_micro")
    )


def pack_sequences(docs, budget=512, shards=8, tokens_col=None):
    """Concat-then-chunk sequence packing (training-batch assembly):
    documents are deterministically ordered within ``shards`` hash
    shards, token counts accumulate, and a document belongs to the
    sequence where its text STARTS in the concatenated stream --
    ``seq_id = floor((cumsum - n_tokens) / budget)``, the standard
    LLM-pretraining packing semantics.

    Deterministic under repartitioning (order = (md5 bucket, doc_id)
    within shard) and one window shuffle total; shards bound the
    window partitions so no single task sorts the corpus.
    """
    n_tokens = (
        F.col(tokens_col) if tokens_col
        else F.size(F.split(F.col("text"), " "))
    )
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
               16, 10).cast("long"),
        F.lit(shards),
    ).cast("int")
    d = docs.select(
        "doc_id", shard.alias("shard"), n_tokens.alias("n_tokens"),
        _bucket().alias("bucket"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        "doc_id",
        "shard",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor((cum - F.col("n_tokens")) / budget)
        .cast("int").alias("seq_id"),
        F.pmod(cum - F.col("n_tokens"), F.lit(budget))
        .cast("int").alias("seq_offset"),
    )


# --- DSIR-style importance weighting -----------------------------------------
DSIR_BUCKETS = 64
DSIR_HEX_DIGITS = 4  # 16 bits of md5 -> bucket id


def dsir_weights(docs, target_predicate="lang = 'en'",
                 n_buckets=DSIR_BUCKETS):
    """Data Selection via Importance Resampling (Xie et al. 2023),
    hashed bag-of-tokens form: score every document by how much more
    likely its tokens are under a TARGET distribution than under the
    raw-corpus distribution.  Features are md5-hashed lowercase
    tokens (the textstats BPE-ish tokenizer) in ``n_buckets``
    buckets; both distributions are add-one-smoothed bucket
    frequencies; the per-document weight is the sum of per-token
    log-likelihood ratios.

    Output ``(doc_id, logw_micro, n_tokens, keep)``: the weight is
    integerized to micro-nats PER BUCKET (``floor(1e6 * ln(ratio))``
    as BIGINT) before the per-document sum, so everything after the
    single ``ln`` is integer-exact across engines -- the
    entity_pagerank integerization recipe.  ``keep`` flags documents
    that look more target-like than raw (positive weight).

    Scale shape: token explode (narrow, the shingle-pass
    amplification) -> one (doc, bucket) groupBy (uniform keys,
    map-side combinable) -> the target/raw bucket tables and the
    1-row totals reduce from THAT aggregate (n_buckets rows, not the
    corpus) -> a broadcast lookup join + one per-doc groupBy.  The
    per-doc sum is bounded by doc_tokens * max|lr| ~ 1e13 -- no
    overflow under ANSI long arithmetic."""
    from .textstats import TOKEN_PATTERN

    toks = docs.select(
        "doc_id",
        F.expr(target_predicate).alias("__is_target"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
            )
        ).alias("tok"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("tok")), 1, DSIR_HEX_DIGITS), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    ).cast("int")
    # doc_bucket feeds FOUR branches (raw, target, totals, the final
    # score join): localCheckpoint (eager) so the token explode +
    # groupBy runs once, not per branch (CLAUDE.md multi-branch rule)
    doc_bucket = (
        toks.select("doc_id", "__is_target", bucket.alias("bucket"))
        .groupBy("doc_id", "__is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    raw = doc_bucket.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    tgt = (
        doc_bucket.filter(F.col("__is_target"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("t_cnt"))
    )
    totals = doc_bucket.agg(
        F.sum(F.when(F.col("__is_target"), F.col("cnt")).otherwise(0))
        .alias("__T"),
        F.sum("cnt").alias("__R"),
    )
    b = float(n_buckets)
    lut = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce("t_cnt", F.lit(0)) + 1).cast("double")
                        / (F.col("__T").cast("double") + F.lit(b))
                    )
                    / (
                        (F.col("r_cnt") + 1).cast("double")
                        / (F.col("__R").cast("double") + F.lit(b))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        doc_bucket.join(F.broadcast(lut), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("lr_micro")).alias("logw_micro"),
            F.sum("cnt").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "logw_micro",
            "n_tokens",
            (F.col("logw_micro") > 0).alias("keep"),
        )
    )


def unigram_ppl(docs, ref_predicate=None):
    """CCNet-style unigram-LM perplexity scoring: fit an add-one-
    smoothed unigram distribution on a reference corpus (the whole
    input by default, or the subset matching ``ref_predicate`` --
    e.g. ``"lang = 'en'"`` to score against clean-language text) and
    score every document by mean negative log-likelihood.  CCNet
    buckets documents into head/middle/tail on this signal; the
    integer ``ppl_band`` (whole nats of mean NLL) is the deterministic
    bucketing key emitted here.

    Output ``(doc_id, n_tokens, logprob_micro, mean_nll_micro,
    ppl_band)``.  Parity recipe: per-token log-probabilities are
    integerized to micro-nats (``floor(1e6 * ln((c+1)/(T+V)))``)
    BEFORE any sum, so document scores are integer-exact across
    engines, and the mean is an integer floor division (the
    entity_pagerank recipe, twice).

    Scale shape: token explode -> one (doc, token) groupBy (uniform
    keys) -> the V-row probability table reduces from that aggregate
    -> score join keyed by token.  The probability table is
    vocabulary-sized (NOT broadcastable at web scale), so the score
    join is a plain shuffle join; natural-language token frequency is
    Zipfian, so the hot keys ('the', ',') are exactly what AQE
    skew-join splitting exists for -- at 100 TB enable
    spark.sql.adaptive.skewJoin (on by default with AQE).  The
    3-consumer (doc, token) aggregate is localCheckpointed like
    dsir_weights'."""
    from .textstats import TOKEN_PATTERN

    is_ref = (
        F.expr(ref_predicate) if ref_predicate is not None else F.lit(True)
    )
    doc_tok = (
        docs.select(
            "doc_id",
            is_ref.alias("__is_ref"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
                )
            ).alias("token"),
        )
        .groupBy("doc_id", "__is_ref", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    ref_counts = (
        doc_tok.filter(F.col("__is_ref"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("ref_cnt"))
    )
    totals = ref_counts.agg(
        F.sum("ref_cnt").alias("__T"),
        F.count(F.lit(1)).alias("__V"),
    )
    lut = ref_counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.floor(
            F.log(
                (F.col("ref_cnt") + 1).cast("double")
                / (F.col("__T") + F.col("__V")).cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("lp_micro"),
    )
    # OOV vs the reference subset: join totals once more for the
    # unseen-token probability 1/(T+V)
    scored = (
        doc_tok.join(lut, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "cnt",
            F.coalesce(
                "lp_micro",
                F.floor(
                    F.log(
                        F.lit(1.0)
                        / (F.col("__T") + F.col("__V")).cast("double")
                    )
                    * 1e6
                ).cast("long"),
            ).alias("lp_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("lp_micro")).alias("logprob_micro"),
        F.sum("cnt").alias("n_tokens"),
    )
    # INTEGER division end-to-end (Spark `div` == DuckDB `//` on
    # non-negative operands): double-rounded float division could
    # flip the floor at a band boundary
    return agg.select(
        "doc_id",
        "n_tokens",
        "logprob_micro",
        F.expr("(-logprob_micro) div n_tokens").alias("mean_nll_micro"),
        F.expr("((-logprob_micro) div n_tokens) div 1000000")
        .alias("ppl_band"),
    )


def bigram_ppl(docs, ref_predicate=None):
    """Bigram-LM perplexity -- the ORDER-AWARE companion to
    ``unigram_ppl`` (CCNet's production signal is an n-gram KenLM;
    this is the n=2 member of that family, exact and portable): fit
    add-one-smoothed conditional bigram probabilities
    ``p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V)`` on the reference subset
    (``c(w1)`` = reference context count, ``V`` = number of distinct
    reference contexts) and score every document by mean bigram NLL.
    Scrambled word salad scores WORSE than fluent text with the same
    unigram profile -- the signal unigram_ppl cannot see.

    Output ``(doc_id, n_bigrams, logprob_micro, mean_nll_micro,
    ppl_band)``; same micro-nat integerization recipe as
    unigram_ppl, so scores are integer-exact cross-engine.  Docs
    with fewer than 2 tokens have no bigrams and are absent.

    Scale shape: bigram explode -> one (doc, w1, w2) groupBy
    (uniform keys; localCheckpointed, 2 consumers) -> the bigram LUT
    and context table reduce from it -> two Zipfian-keyed shuffle
    joins back ((w1,w2) then w1) -- AQE skew-join territory, same
    note as unigram_ppl; V rides a 1-row broadcast."""
    from .textstats import TOKEN_PATTERN

    is_ref = (
        F.expr(ref_predicate) if ref_predicate is not None else F.lit(True)
    )
    toks = docs.select(
        "doc_id",
        is_ref.alias("__is_ref"),
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
        ).alias("ts"),
    )
    pairs = toks.select(
        "doc_id",
        "__is_ref",
        F.explode(
            F.zip_with(
                F.expr("slice(ts, 1, greatest(size(ts) - 1, 0))"),
                F.expr("slice(ts, 2, greatest(size(ts) - 1, 0))"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "__is_ref",
        F.col("bg.w1").alias("w1"),
        F.col("bg.w2").alias("w2"),
    )
    doc_big = (
        pairs.groupBy("doc_id", "__is_ref", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    ref_big = (
        doc_big.filter(F.col("__is_ref"))
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("cb"))
    )
    ref_ctx = ref_big.groupBy("w1").agg(F.sum("cb").alias("c1"))
    vocab = ref_ctx.agg(F.count(F.lit(1)).alias("__V"))
    scored = (
        doc_big.join(ref_big, ["w1", "w2"], "left")
        .join(ref_ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "cnt",
            F.floor(
                F.log(
                    (F.coalesce("cb", F.lit(0)) + 1).cast("double")
                    / (
                        F.coalesce("c1", F.lit(0)) + F.col("__V")
                    ).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("lp_micro")).alias("logprob_micro"),
        F.sum("cnt").alias("n_bigrams"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "logprob_micro",
        F.expr("(-logprob_micro) div n_bigrams").alias("mean_nll_micro"),
        F.expr("((-logprob_micro) div n_bigrams) div 1000000")
        .alias("ppl_band"),
    )
