"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.  All Catalyst-only (higher-order
array functions + regexp), each with a DuckDB-expressible twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# tiny deterministic stopword lists; tie order en > de > fr > es
STOPWORDS = {
    "en": ["the", "of", "and", "a", "to", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

# Whitespace as an EXPLICIT character class (space \t \n \x0B \f \r):
# Java regex \s and DuckDB/RE2 \s disagree on \x0B (vertical tab), so
# every tokenizer that has a DuckDB oracle twin spells the class out --
# identical bytes on both engines.  Built with chr() arithmetic
# (CLAUDE.md unicode file-write constraint); the class equals Java \s
# exactly, so Spark-side behavior is unchanged.
WS_CHARS = " " + chr(9) + chr(10) + chr(11) + chr(12) + chr(13)
NON_WORD_CLASS = "[^a-zA-Z0-9" + WS_CHARS + "]"

# BPE-ish token regex: word pieces, numbers, punctuation runs
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|" + NON_WORD_CLASS
FINGERPRINT_WINDOW = 20


def _words(col="text"):
    return F.split(F.col(col), " ")


def lang_id(docs):
    """N-gram-free heuristic language ID: stopword-hit ratio per
    language, argmax with fixed tie order.  Returns
    (doc_id, lang_pred, en_hits, de_hits, fr_hits, es_hits, n_words).
    """
    words = _words()
    exprs = [F.col("doc_id")]
    hit_cols = {}
    for lang in LANG_ORDER:
        lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(lst, w)))
        hit_cols[lang] = hits
        exprs.append(hits.alias(f"{lang}_hits"))
    exprs.append(F.size(words).alias("n_words"))
    out = docs.select(*exprs)
    best = F.lit(LANG_ORDER[-1])
    # build argmax right-to-left so earlier langs win ties
    for lang in reversed(LANG_ORDER[:-1]):
        later = [F.col(f"{x}_hits") for x in
                 LANG_ORDER[LANG_ORDER.index(lang) + 1:]]
        cond = F.col(f"{lang}_hits") >= F.greatest(*later) if len(later) > 1 \
            else F.col(f"{lang}_hits") >= later[0]
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return out.select(
        "doc_id", best.alias("lang_pred"),
        "en_hits", "de_hits", "fr_hits", "es_hits", "n_words",
    )


def quality_score(docs):
    """Length / punctuation / stopword-ratio quality features and a
    deterministic combined score in [0, 1]."""
    words = _words()
    n_chars = F.length("text")
    n_words = F.size(words)
    n_punct = F.size(
        F.split(F.col("text"), NON_WORD_CLASS)
    ) - 1
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = (
        F.size(F.filter(words, lambda w: F.array_contains(en, w)))
        / F.greatest(n_words, F.lit(1))
    )
    mean_word_len = (
        (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0)))
        * 0.3
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(docs):
    """Whitespace word count + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.size(_words()).alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_PATTERN)).alias(
            "n_tokens"
        ),
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1
# character): a document is repetitive when its most frequent word
# 2-gram covers more than ~18% of bigram slots or more than ~30% of
# its trigram occurrences are repeats.  Compared on the ROUNDED
# fractions so the flag is bit-identical across engines.
REP_TOP_BIGRAM_MAX = 0.18
REP_DUP_TRIGRAM_MAX = 0.30
# the flag only applies above a minimum length: a 2-word document's
# single bigram "covers 100%" of slots -- degenerate, not repetitive
REP_MIN_WORDS = 10

# The FULL Gopher character-fraction ladder (Rae et al. 2021 table A1):
# top n-gram character fraction for n=2..4 (characters covered by the
# single most frequent n-gram / document characters) and duplicate
# n-gram character fraction for n=5..10 (characters covered by all
# occurrences of n-grams appearing more than once / document
# characters).  Character mass counts every occurrence without
# overlap-deduplication -- the standard approximation in open
# reimplementations of the filter -- and is clamped at 1.0.
REP_TOP_NGRAM_CHAR_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
REP_DUP_NGRAM_CHAR_MAX = {
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
}
REP_NS = (2, 3, 4, 5, 6, 7, 8, 9, 10)


def _gram_cases_sql(ns=REP_NS):
    """SQL-expr fragments building the tagged n-gram struct arrays for
    every rung of the ladder -- all rungs ride ONE explode.  Grams are
    space-joined word windows, identical bytes to the DuckDB oracle's
    ``w[i] || ' ' || ...`` construction."""
    cases = []
    for n in ns:
        parts = "concat(" + ", ' ', ".join(
            f"element_at(w, i + {j})" if j else "element_at(w, i)"
            for j in range(n)
        ) + ")"
        cases.append(
            f" CASE WHEN size(w) >= {n} THEN"
            f"  transform(sequence(1, size(w) - {n - 1}),"
            f"   i -> struct({n} AS g, {parts} AS gram))"
            f" ELSE array() END"
        )
    return cases


def repetition_stats(docs, top_bigram_max=REP_TOP_BIGRAM_MAX,
                     dup_trigram_max=REP_DUP_TRIGRAM_MAX,
                     min_words=REP_MIN_WORDS):
    """FULL Gopher-rule repetition features per document (Rae et al.
    2021 table A1; round-4 verdict action #5): duplicate-word
    fraction, top-bigram slot coverage, duplicate-trigram occurrence
    fraction, top n-gram CHARACTER fractions for n=2..4, and
    duplicate n-gram CHARACTER fractions for n=5..10, plus the
    combined ``is_repetitive`` flag (any rule exceeded).  Complements
    ``quality_score`` (length/punct/stopwords): repetition rules are
    the standard CCNet/Gopher filter for looping boilerplate and
    keyword-stuffed spam that passes length checks.

    Shape: ALL NINE n-gram rungs explode TOGETHER (one tagged pass,
    one map-side-combinable groupBy chain) and join back per doc_id --
    still two narrow shuffles total, no per-document quadratic work,
    no Python.  Documents too short for an n-gram get zero fractions
    via the left join (never dropped).

    The "top" gram per (doc, n) is chosen by (count, char length)
    lexicographic max -- deterministic across engines (Spark struct
    max == DuckDB struct max); character mass counts every occurrence
    without overlap-dedup and fractions clamp at 1.0."""
    words = _words()
    base = docs.select(
        "doc_id",
        words.alias("w"),
        F.size(words).alias("n_words"),
        F.length("text").alias("n_chars"),
    )
    # element_at is 1-based; sequence bounds keep every index valid
    # under ANSI (CLAUDE.md: getItem/element_at throw out-of-range)
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr("concat(" + ",".join(_gram_cases_sql()) + ")")
        ).alias("t"),
    ).select("doc_id", "t.g", "t.gram")
    counts = grams.groupBy("doc_id", "g", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_g = counts.groupBy("doc_id", "g").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("tot_c"),
        F.count(F.lit(1)).alias("distinct_c"),
        # (count, gram char length) lexicographic max -> top char mass
        F.max(
            F.struct(F.col("c").alias("c"),
                     F.length("gram").alias("l"))
        ).alias("tops"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram"))
        ).alias("dup_mass"),
    )

    def _pick(g, col):
        return F.max(F.when(F.col("g") == g, col))

    pivots = [
        _pick(2, F.col("top_c")).alias("bg_top"),
        _pick(2, F.col("tot_c")).alias("bg_tot"),
        _pick(3, F.col("tot_c")).alias("tg_tot"),
        _pick(3, F.col("distinct_c")).alias("tg_distinct"),
    ]
    for n in REP_TOP_NGRAM_CHAR_MAX:
        pivots.append(
            _pick(n, F.col("tops.c") * F.col("tops.l"))
            .alias(f"t{n}_mass")
        )
    for n in REP_DUP_NGRAM_CHAR_MAX:
        pivots.append(_pick(n, F.col("dup_mass")).alias(f"d{n}_mass"))
    stats = per_g.groupBy("doc_id").agg(*pivots)

    j = base.join(stats, "doc_id", "left")
    top_bigram_frac = F.round(
        F.coalesce(
            F.col("bg_top") / F.col("bg_tot"), F.lit(0.0)
        ),
        6,
    )
    dup_trigram_frac = F.round(
        F.coalesce(
            1 - F.col("tg_distinct") / F.col("tg_tot"), F.lit(0.0)
        ),
        6,
    )
    dup_word_frac = F.round(
        1 - F.size(F.array_distinct("w")) / F.col("n_words"), 6
    )

    def char_frac(mass_col):
        # n_chars = 0 guard (ANSI /0); clamp at 1.0 (unmerged overlaps
        # can exceed the document's characters)
        return F.round(
            F.when(
                F.col("n_chars") > 0,
                F.least(
                    F.lit(1.0),
                    F.coalesce(
                        mass_col / F.col("n_chars").cast("double"),
                        F.lit(0.0),
                    ),
                ),
            ).otherwise(F.lit(0.0)),
            6,
        )

    frac_cols = {}
    flag = (top_bigram_frac > F.lit(float(top_bigram_max))) | (
        dup_trigram_frac > F.lit(float(dup_trigram_max))
    )
    for n, thr in REP_TOP_NGRAM_CHAR_MAX.items():
        fc = char_frac(F.col(f"t{n}_mass"))
        frac_cols[f"top_{n}gram_char_frac"] = fc
        flag = flag | (fc > F.lit(float(thr)))
    for n, thr in REP_DUP_NGRAM_CHAR_MAX.items():
        fc = char_frac(F.col(f"d{n}_mass"))
        frac_cols[f"dup_{n}gram_char_frac"] = fc
        flag = flag | (fc > F.lit(float(thr)))

    return j.select(
        "doc_id",
        "n_words",
        dup_word_frac.alias("dup_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
        *[fc.alias(name) for name, fc in frac_cols.items()],
        (
            (F.col("n_words") >= F.lit(int(min_words))) & flag
        ).alias("is_repetitive"),
    )


def fingerprint(docs, window=FINGERPRINT_WINDOW):
    """Rolling-hash document fingerprint (winnowing with a whole-doc
    window): min md5 over all char ``window``-grams, plus the full-text
    hash.  Robust to local edits outside the minimizing window."""
    # substring with a dynamic start index needs expr() (the Python DSL
    # substring() takes literals only)
    grams = F.expr(
        f"transform(sequence(1, greatest(length(text) - {window} + 1, 1)),"
        f" i -> md5(substring(text, i, {window})))"
    )
    return docs.select(
        "doc_id",
        F.array_min(grams).alias("min_gram_hash"),
        F.md5("text").alias("full_hash"),
    )


def geo_mean_by_lang(docs_df):
    """Grouped-agg pandas UDF surface (Arrow-batched UDAF): geometric
    mean of document length per language.  Built lazily (pandas_udf
    type parsing needs an active session); pandas/numpy imported at
    call scope but annotated with real types so hint inference works.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.astype("float64")).mean()))

    def _n(v: pd.Series) -> int:
        return int(len(v))

    _geo_mean.__annotations__ = {"v": pd.Series, "return": float}
    _n.__annotations__ = {"v": pd.Series, "return": int}
    geo_mean = pandas_udf(_geo_mean, "double")
    n_rows = pandas_udf(_n, "long")

    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one
    # agg() -- both outputs go through the pandas aggregation path
    return docs_df.groupBy("lang").agg(
        F.round(geo_mean("n_chars"), 6).alias("geo_chars"),
        n_rows("n_chars").alias("n_docs"),
    )


CHUNK_SIZE = 40
CHUNK_STRIDE = 30


def chunk_documents(docs, chunk_size=CHUNK_SIZE, stride=CHUNK_STRIDE):
    """Overlapping word-window chunking (context-window packing for
    training): chunk i covers words [i*stride, i*stride+chunk_size).
    Catalyst-only (sequence + explode + slice); at corpus scale the
    explode is a narrow map with bounded (size/stride) amplification
    and no shuffle."""
    words = _words()
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - 1, F.lit(0)),
        F.lit(stride),
    )
    e = docs.select(
        "doc_id", words.alias("w"), F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("w"), F.col("start") + 1, F.lit(chunk_size))
    return e.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_chunk_words"),
    )


# kept deliberately simple and identical across Java/RE2 dialects
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
LONGNUM_PATTERN = "[0-9]{6,}"


def redact_pii(docs):
    """Deterministic PII scrubbing (training-data hygiene): emails and
    long digit runs replaced with typed placeholders, with per-doc
    redaction counts for lineage.  Zero-shuffle Catalyst regexp."""
    n_emails = F.size(
        F.regexp_extract_all("text", F.lit(EMAIL_PATTERN), 0)
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_PATTERN, "<EMAIL>"),
        LONGNUM_PATTERN,
        "<NUM>",
    )
    n_nums = F.size(
        F.regexp_extract_all(
            F.regexp_replace("text", EMAIL_PATTERN, "<EMAIL>"),
            F.lit(LONGNUM_PATTERN),
            0,
        )
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted_text"),
        n_emails.alias("n_emails"),
        n_nums.alias("n_longnums"),
    )


# --- tokenizer vocabulary construction ---------------------------------------
VOCAB_SIZE = 256


def build_vocab(docs, k=VOCAB_SIZE):
    """Tokenizer-vocabulary construction, the pretraining step before
    any BPE refinement: the top-``k`` corpus tokens by total count
    (ties broken lexicographically -- deterministic cross-engine),
    with contiguous ids in that order plus total/document frequencies.
    Output ``(token, token_id, count, doc_freq)``, ``token_id`` 0-based.

    Scale shape: tokenize (the shared BPE-ish TOKEN_PATTERN,
    lowercased) -> one uniform-key groupBy -> global top-k.  The
    top-k is ``orderBy().limit(k)`` -- Catalyst plans it as
    TakeOrderedAndProject (per-partition heaps + a k-row merge), not
    a global sort.  The id-assigning window then runs over the
    ALREADY-LIMITED k-row frame: unpartitioned but bounded by
    construction (k rows), the same footnoted pattern as
    init_centroids' pool ranking."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    top = counts.orderBy(
        F.col("count").desc(), F.col("token").asc()
    ).limit(k)
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    return top.select(
        "token",
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "count",
        "doc_freq",
    )


def oov_stats(docs, vocab):
    """Per-document out-of-vocabulary profile against a vocab table:
    total tokens, tokens covered by the vocab, and the OOV rate --
    the signal for sizing a tokenizer or filtering out-of-domain
    documents.  The vocab is k rows by construction -> broadcast
    join; one narrow tokenize + one doc-keyed groupBy."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
            )
        ).alias("token"),
    )
    hit = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("__in_vocab"))),
        "token",
        "left",
    )
    agg = hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce("__in_vocab", F.lit(0))).alias("n_in_vocab"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_in_vocab", F.lit(0)).alias("n_in_vocab"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.round(
                (F.coalesce("n_tokens", F.lit(0))
                 - F.coalesce("n_in_vocab", F.lit(0))).cast("double")
                / F.coalesce("n_tokens", F.lit(1)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("oov_rate"),
    )


TFIDF_TOP_K = 5


def tfidf_keywords(docs, k=TFIDF_TOP_K, min_df=1):
    """TF-IDF keyword extraction: the top-``k`` alphabetic
    non-stopword tokens per document ranked by tf x idf -- the
    classic per-document topicality signal (domain tagging, dedup
    explanation, corpus browsing).  idf is smoothed
    ``ln((N+1)/(df+1))`` and integerized to micro-nats
    (``floor(1e6 * ln)``), so ``score_micro = tf * idf_micro`` is
    integer-exact cross-engine; ties break token-ascending.
    Output ``(doc_id, rank, token, tf, df, score_micro)``.

    Scale shape: tokenize -> one (doc, token) tf groupBy (uniform
    keys; localCheckpointed, 2 consumers) -> token-keyed df
    aggregate reduces from it -> token-keyed shuffle join back.  The
    df table is vocabulary-sized (NOT broadcastable at web scale)
    and token frequency is Zipfian, so the join is the textbook AQE
    skew-join case -- same note as unigram_ppl's score join.  The
    corpus-count side is a 1-row broadcast.  The final top-k window
    is partitioned by doc_id (never global)."""
    from pyspark.sql import Window

    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
                )
            ).alias("token"),
        )
        .filter(
            F.col("token").rlike("^[a-z]+$")
            & ~F.col("token").isin(all_stop)
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ndocs = docs.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        tf.join(dfreq, "token")
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * F.floor(
                    F.log(
                        (F.col("__N") + 1).cast("double")
                        / (F.col("df") + 1).cast("double")
                    )
                    * 1e6
                ).cast("long")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df", "score_micro")
    )


def nfc_profile(docs):
    """Unicode NFC-normalization profile per document -- the web-text
    cleaning signal for mojibake / decomposed-form detection and for
    normalization-invariant dedup keys: ``(doc_id, changed,
    norm_len, norm_hash)`` where ``norm_hash`` is the md5 hex of the
    NFC-normalized text's UTF-8 bytes (the dedup key that collapses
    canonically-equivalent spellings) and ``changed`` flags documents
    whose text was not already in NFC.

    Spark has no built-in Unicode normalizer, so this is an
    Arrow-batched Python kernel (``mapInPandas``), the same
    documented slow-path pattern as the canonize kernel -- NOT a
    per-row UDF.  The DuckDB twin is ``nfc_normalize`` (utf8proc);
    both implement Unicode canonical composition, equality pinned by
    the planted-combining-mark test.

    Scale shape: embarrassingly parallel map over existing
    partitions -- ZERO shuffles, no driver involvement; column
    pruning via the explicit select."""
    import pandas as pd

    def kernel(batches):
        import hashlib
        import unicodedata

        for pdf in batches:
            norm = [
                unicodedata.normalize("NFC", s) if s is not None else None
                for s in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "changed": [
                        n != s
                        for n, s in zip(norm, pdf["text"])
                    ],
                    "norm_len": [
                        len(n) if n is not None else 0 for n in norm
                    ],
                    "norm_hash": [
                        hashlib.md5(n.encode("utf-8")).hexdigest()
                        if n is not None
                        else None
                        for n in norm
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel,
        "doc_id long, changed boolean, norm_len int, norm_hash string",
    )


# C4 line-level cleaning rules (Raffel et al. 2020 "Exploring the
# Limits of Transfer Learning" §2.2 -- the C4 heuristics, applied per
# LINE rather than per page where the paper does): a line survives only
# if it has >= LINE_MIN_WORDS words, ends in terminal punctuation,
# contains no curly brace (code), and does not mention "javascript"
# (boilerplate browser warnings).  A document survives only if it keeps
# >= DOC_MIN_KEPT_LINES lines and never says "lorem ipsum".  Rule order
# is FIXED (short -> no_terminal -> brace -> javascript) so the
# first-failing reason is deterministic cross-engine.
LINE_MIN_WORDS = 5
DOC_MIN_KEPT_LINES = 3
# terminal punctuation: . ! ? " '  (quote chars via chr() -- CLAUDE.md
# unicode file-write constraint).  Checked via right(line, 1) IN set,
# NOT a '$'-anchored regex: Java '$' matches BEFORE a final line
# terminator (\r, U+0085, U+2028, U+2029) while RE2 '$' matches only
# end-of-string, so an anchored regex diverges between Spark and the
# DuckDB oracle on CRLF text.
LINE_TERMINAL_CHARS = (".", "!", "?", chr(34), chr(39))
LINE_WORD_REGEX = "[^" + WS_CHARS + "]+"
LINE_RULES = ("short", "no_terminal", "brace", "javascript")


def line_filter(docs, min_words=LINE_MIN_WORDS,
                min_kept=DOC_MIN_KEPT_LINES):
    """C4-style line-level cleaning: tag every line with its
    first-failing rule (or NULL = kept), rebuild the cleaned text from
    the kept lines, and gate the document on a minimum kept-line count
    plus the page-level "lorem ipsum" rule.  Output ``(doc_id,
    n_lines, n_kept, n_short, n_no_terminal, n_brace, n_javascript,
    lorem_ipsum, doc_kept, clean_text)``.

    Rules evaluate on the space-trimmed line; ``clean_text`` keeps the
    ORIGINAL line bytes (joined with newline) so cleaning never
    rewrites surviving content.

    Scale shape: pure per-row Catalyst higher-order functions (split /
    transform / filter / array_join) -- ZERO shuffles, ZERO explodes,
    no Python.  At 100 TB this is a map-only stage that rides whatever
    partitioning the scan provides; column pruning via the explicit
    select."""

    def reason(l):
        # strip trailing spaces AND CRLF carriage returns (trim ->
        # rtrim(cr) -> trim handles any space/cr tail interleaving);
        # character-set trims, never a '$' regex (Java/RE2 divergence)
        t = F.trim(F.rtrim(F.trim(l), F.lit(chr(13))))
        wc = F.size(
            F.regexp_extract_all(t, F.lit(LINE_WORD_REGEX), F.lit(0))
        )
        last = F.substring(t, -1, 1)
        return (
            F.when(wc < min_words, F.lit("short"))
            .when(~last.isin(*LINE_TERMINAL_CHARS), F.lit("no_terminal"))
            .when(t.contains("{") | t.contains("}"), F.lit("brace"))
            .when(F.lower(t).contains("javascript"), F.lit("javascript"))
        )

    tagged = F.transform(
        F.split(F.col("text"), chr(10)),
        lambda l: F.struct(l.alias("line"), reason(l).alias("reason")),
    )
    out = docs.select(
        "doc_id",
        F.lower(F.col("text")).contains("lorem ipsum").alias(
            "lorem_ipsum"
        ),
        tagged.alias("__tl"),
    )
    kept = F.filter(F.col("__tl"), lambda t: t["reason"].isNull())
    def rule_count(rule):
        # a closure, NOT a default-arg lambda: a 2-parameter lambda
        # would make F.filter bind the second arg to the array INDEX
        return F.size(
            F.filter(F.col("__tl"), lambda t: t["reason"] == rule)
        ).alias(f"n_{rule}")

    rule_counts = [rule_count(r) for r in LINE_RULES]
    return out.select(
        "doc_id",
        F.size("__tl").alias("n_lines"),
        F.size(kept).alias("n_kept"),
        *rule_counts,
        "lorem_ipsum",
        (
            (~F.col("lorem_ipsum")) & (F.size(kept) >= min_kept)
        ).alias("doc_kept"),
        F.array_join(
            F.transform(kept, lambda t: t["line"]), chr(10)
        ).alias("clean_text"),
    )


QUALITY_KEEP_FRAC = 0.7


def quality_threshold(docs, keep_frac=QUALITY_KEEP_FRAC):
    """Per-language quality cutoff table -- the dynamic-threshold
    calibration step behind 'keep the best X% per language' curation
    (CCNet-style head selection): for each language, the LARGEST
    quality level ``thr_micro`` such that keeping docs with
    ``quality_micro >= thr_micro`` yields at least ``ceil(keep_frac *
    n)`` documents.  Output ``(lang, n_docs, n_target, thr_micro,
    n_kept)``; the gate itself is then a trivial broadcast-joined
    filter.  quality is round(x, 6), so ``quality_micro = round(q *
    1e6)`` is integer-exact cross-engine, and the ceil is the integer
    identity ``(n * k + 1e6 - 1) div 1e6``.

    Scale shape: per-doc quality (narrow) -> a (lang, quality-level)
    HISTOGRAM aggregate -- the cumulative window then runs over
    histogram rows (distinct quality levels per language, orders of
    magnitude below doc count), partitioned by lang, never over the
    corpus.  This is the exact-threshold alternative to sorting docs
    per language (a per-lang global sort would be the scale bug)."""
    from pyspark.sql import Window

    k_micro = int(round(keep_frac * 1e6))
    q = quality_score(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    hist = q.select(
        "lang",
        F.round(F.col("quality") * 1e6).cast("long").alias("q_micro"),
    ).groupBy("lang", "q_micro").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("q_micro").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    totals = hist.groupBy("lang").agg(F.sum("c").alias("n_docs"))
    j = cum.join(totals, "lang").withColumn(
        "n_target",
        F.expr(f"(n_docs * {k_micro} + 999999) div 1000000"),
    )
    thr = (
        j.filter(F.col("cum") >= F.col("n_target"))
        .groupBy("lang", "n_docs", "n_target")
        .agg(F.max("q_micro").alias("thr_micro"))
    )
    return thr.join(
        cum.select(
            "lang",
            F.col("q_micro").alias("thr_micro"),
            F.col("cum").alias("n_kept"),
        ),
        ["lang", "thr_micro"],
    ).select("lang", "n_docs", "n_target", "thr_micro", "n_kept")


def length_histogram(docs):
    """Token-length distribution by power-of-2 bucket per language --
    the one-glance corpus-shape artifact behind truncation budgets,
    packing efficiency and outlier clipping decisions.  Bucket =
    bit length of the token count (``length(bin(n))``, integer-exact
    on both engines; 0 for empty docs), so bucket b holds docs with
    2^(b-1) <= n < 2^b.  Output ``(lang, len_bucket, n_docs,
    total_tokens, min_tokens, max_tokens)``.

    Scale shape: one narrow tokenize-count projection + one
    (lang, bucket)-keyed aggregate, every term map-side combinable;
    key cardinality is languages x ~40 buckets, so the shuffle is
    trivially small at any corpus size."""
    n = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
        )
    )
    bucket = (
        F.when(n <= 0, F.lit(0))
        .otherwise(F.length(F.bin(n.cast("bigint"))))
        .cast("int")
    )
    return (
        docs.select(
            "lang",
            n.cast("long").alias("n"),
            bucket.alias("len_bucket"),
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


# BPE trainer: number of merge rounds learned by the contract query
# (the oracle unrolls exactly this many CTE chains)
BPE_N_MERGES = 6
BPE_END_MARK = "</w>"


def bpe_merges(docs, n_merges=BPE_N_MERGES):
    """Byte-pair-encoding merge learning (Sennrich et al. 2016) -- the
    actual tokenizer-training step behind every modern LM vocabulary:
    learn the top ``n_merges`` symbol-pair merges from the corpus and
    return the merge table ``(merge_rank, w1, w2, pair_count)`` (the
    merges.txt artifact).

    Symbols are wrapped ``(sym)`` and space-joined, so each merge is a
    PLAIN string replace of ``'(w1) (w2)' -> '(w1w2)'`` with exact BPE
    semantics: the guards make cross-symbol false matches impossible
    (no symbol contains a paren), adjacent occurrences don't steal
    each other's delimiter (the pattern carries no surrounding
    spaces), and both engines' replace() scans left-to-right
    non-overlapping -- which is precisely BPE's merge order for
    ``w1 == w2`` runs.  Ties break (count DESC, w1 ASC, w2 ASC);
    guard-wrapped lexicographic order equals unguarded order because
    ``)`` sorts below every symbol character.

    Scale shape: ONE corpus-sized pass builds the word-frequency
    table; every round after that runs on that vocabulary-sized table
    (the classic trick that makes BPE trainable on web corpora): an
    adjacent-pair explode + one uniform-key aggregate + a
    TakeOrdered(1) + a 1-row broadcast LEFT join (footnoted BNLJ, same
    pattern as dsir_weights' totals) and a per-round localCheckpoint
    to truncate lineage.  Words with the same spelling collapse to
    one row, so merging is weight-exact."""
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
                )
            ).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seqs = words.select(
        "cnt",
        F.concat(
            F.array_join(
                F.transform(
                    F.regexp_extract_all(
                        F.col("word"), F.lit("."), F.lit(0)
                    ),
                    lambda c: F.concat(F.lit("("), c, F.lit(")")),
                ),
                " ",
            ),
            F.lit(" (" + BPE_END_MARK + ")"),
        ).alias("seq"),
    ).localCheckpoint()
    merge_rows = []
    for i in range(1, n_merges + 1):
        pairs = (
            seqs.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.expr(
                            "slice(split(seq, ' '), 1,"
                            " greatest(size(split(seq, ' ')) - 1, 0))"
                        ),
                        F.expr(
                            "slice(split(seq, ' '), 2,"
                            " greatest(size(split(seq, ' ')) - 1, 0))"
                        ),
                        lambda a, b: F.struct(
                            a.alias("w1"), b.alias("w2")
                        ),
                    )
                ).alias("pr"),
            )
            .groupBy(
                F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
            )
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = (
            pairs.orderBy(
                F.col("pair_count").desc(),
                F.col("w1").asc(),
                F.col("w2").asc(),
            )
            .limit(1)
            .localCheckpoint()
        )
        merge_rows.append(
            top.select(
                F.lit(i).alias("merge_rank"),
                F.translate("w1", "()", "").alias("w1"),
                F.translate("w2", "()", "").alias("w2"),
                "pair_count",
            )
        )
        if i == n_merges:
            break  # the final round's merged seqs have no consumer
        seqs = (
            seqs.join(F.broadcast(top), F.lit(True), "left")
            .select(
                "cnt",
                F.when(F.col("w1").isNull(), F.col("seq"))
                .otherwise(
                    F.expr(
                        "replace(seq, concat(w1, ' ', w2),"
                        " concat(substr(w1, 1, length(w1) - 1),"
                        " substr(w2, 2)))"
                    )
                )
                .alias("seq"),
            )
            .localCheckpoint()
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


# posting-list cap: a web-scale index never materializes the full
# posting list of a stopword in one row -- it keeps the df/count
# statistics exact and truncates the stored list deterministically
INDEX_MAX_POSTINGS = 16


def inverted_index(docs, max_postings=INDEX_MAX_POSTINGS):
    """Inverted-index construction (token -> posting list), the
    retrieval-side artifact of a training corpus (decontamination
    lookups, attribution, corpus search): per token the document
    frequency, total occurrence count, and the first ``max_postings``
    doc_ids ascending as a comma-joined string.  Output ``(token, df,
    total_count, n_postings, postings)``.

    Scale shape: tokenize -> (token, doc_id) tf groupBy (uniform
    composite keys) -> token-keyed stats aggregate (map-side
    combinable) + a token-partitioned rank window that TRUNCATES the
    posting list to ``max_postings`` BEFORE any list is materialized
    -- a stopword's posting list never exists in memory, only its
    counts do.  Token keys are Zipfian, so the rank window and the
    final token join are the textbook AQE skew cases (same note as
    unigram_ppl / tfidf_keywords); the cap bounds every collected
    array at ``max_postings`` rows."""
    from pyspark.sql import Window

    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
                )
            ).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("n").alias("total_count"),
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    capped = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_postings)
        .groupBy("token")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("__p"))
        .select(
            "token",
            F.size("__p").alias("n_postings"),
            F.array_join(
                F.transform(F.col("__p"), lambda d: d.cast("string")),
                ",",
            ).alias("postings"),
        )
    )
    return stats.join(capped, "token")


def source_profile(docs):
    """Per-source (domain/crawl-feed) curation profile -- the
    RefinedWeb/C4-style reputation rollup that drives source-level
    include/exclude and mixing decisions: document count, exact-dup
    rate (1 - distinct-text fraction, md5-keyed), token volume with
    floored mean, majority language with purity, and mean document
    length.  Output ``(source, n_docs, dup_rate, total_tokens,
    mean_tokens, major_lang, lang_purity, mean_chars)``.

    Parity recipes: dup_rate/lang_purity are round(x, 6) doubles;
    mean_tokens/mean_chars are integer floor divisions (counts are
    non-negative, so Spark ``div`` == DuckDB ``//``); the majority
    language breaks ties lexicographically via a (count DESC, lang
    ASC) struct max.

    Scale shape: one tokenize + per-doc count (uniform doc keys),
    then TWO source-keyed aggregates ((source, lang) then source) and
    one source-keyed join -- sources are the natural unit of skew
    (one giant domain), and every aggregate here is map-side
    combinable, so a hot source reduces mostly before the shuffle."""
    tok = (
        docs.select(
            "doc_id",
            "source",
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
                )
            ).alias("n_toks"),
            F.md5(F.col("text")).alias("text_key"),
            F.length("text").alias("n_chars"),
        )
    )
    base = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text_key").alias("n_unique"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # (count DESC, lang ASC) argmax as a struct MIN over (-cnt, lang)
    major = lang_counts.groupBy("source").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))
        ).alias("m"),
        F.sum("cnt").alias("n_all"),
    )
    return (
        base.join(major, "source")
        .select(
            "source",
            "n_docs",
            F.round(
                F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            "total_tokens",
            F.expr("total_tokens div n_docs").alias("mean_tokens"),
            F.col("m.lang").alias("major_lang"),
            F.round((-F.col("m.neg")) / F.col("n_all"), 6).alias(
                "lang_purity"
            ),
            F.expr("total_chars div n_docs").alias("mean_chars"),
        )
    )
