"""Similarity search over the embeddings table (``array<float>``).

* ``brute_force_topk`` -- exact cosine top-k, the correctness baseline.
  Dot products via ``zip_with`` + ``aggregate`` in DOUBLE (bit-identical
  to the oracle's double-precision left-to-right sum).
* ``ivf_topk`` -- the scale path: IVF-flat with COMPUTED cells.
  Centroids are a deterministic stride-sample of corpus vectors (no
  Lloyd refinement: a mean-recomputation pass would be
  float-summation-order-dependent and thus not reproducible across
  engines); every vector is assigned to its nearest centroid
  (squared-L2 argmin, one map-side-combinable shuffle); each query
  probes its ``NPROBE`` nearest cells and reranks exactly inside
  them.  At 100 TB the candidate set is |Q| x nprobe x cell instead
  of |Q| x N, and the centroid table is tiny by definition, so it
  broadcasts.
* ``lsh_ann_topk`` -- random-hyperplane LSH: deterministic
  pseudo-hyperplanes (seeded), sign pattern = bucket key, exact rerank
  within bucket.  Hyperplane components are literals, so the same
  buckets are SQL-derivable.

Bucket-width scaling (the 100 TB contract): a FIXED bucket space makes
the within-bucket pair join quadratic in N/2^bits as the corpus grows.
Both hyperplane surfaces therefore take ``bits`` (bucket width) and
``n_tables`` (banded multi-table OR, same shape as the MinHash
``lsh_bands`` path) as parameters: at scale set
``bits ~ log2(N / target_bucket_size)`` so expected occupancy stays
constant, and raise ``n_tables`` to recover the recall each extra bit
costs.  Exact-cosine verification always runs on the candidate
survivors only.  ``tests/test_operators.py`` asserts occupancy stays
bounded under a 10x corpus with log-scaled bits.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

N_QUERIES = 10  # vec_id < N_QUERIES are the query vectors
TOP_K = 5
N_HYPERPLANES = 8
EMB_DIM = 64
CENTROID_STRIDE = 97  # centroid = every 97th corpus vector...
CENTROID_MOD = 13     # ...offset so centroids aren't query vectors
NPROBE = 3


def _hyperplanes(seed=7, n=N_HYPERPLANES, dim=EMB_DIM):
    """Deterministic pseudo-random hyperplanes in [-1, 1] via a tiny
    LCG -- reproducible in SQL as literals, no numpy dependency."""
    planes = []
    state = seed
    for _ in range(n):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (2 ** 31)
            row.append(round(state / (2 ** 31) * 2 - 1, 6))
        planes.append(row)
    return planes


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _load(spark, sf_dir):
    """Load embeddings, excluding zero-norm vectors (cosine undefined;
    they WILL occur in a web-scale corpus and would divide-by-zero
    under ANSI mode)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    return emb.filter(_dot(F.col("v"), F.col("v")) > 0)


def _topk(joined, k):
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def brute_force_topk(spark, sf_dir, k=TOP_K, n_queries=N_QUERIES):
    emb = _load(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # queries are tiny -> broadcast; the corpus side streams
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("v"), F.col("qv"))
        / (_norm(F.col("v")) * _norm(F.col("qv"))),
    )
    return _topk(scored, k)


def _d2(a, b):
    """Squared L2 distance via three dot products: deterministic,
    identical arithmetic to the DuckDB oracle (no engine-internal
    distance kernel whose summation order is unknown)."""
    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


HYPERPLANE_SEED = 7


def centroids(emb, stride=CENTROID_STRIDE, mod=CENTROID_MOD):
    """Deterministic sampled centroids (IVF training stand-in):
    every ``stride``-th corpus vector.  cell_id = the centroid's
    vec_id.  At real scale pass an explicitly trained/sampled centroid
    table instead -- everything downstream only needs (cell_id, cv)."""
    return emb.filter(
        F.col("vec_id") % stride == mod
    ).select(F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"))


IVF_K = 16  # fixed centroid count for the trained/init IVF paths

# expected within-cell occupancy the SCALED dedup config holds constant
# as the corpus grows (k = max(IVF_K, n // occupancy)); mirrors the
# hyperplane paths' bits ~ log2(N / target_bucket_size) rule
SEMDEDUP_TARGET_OCCUPANCY = 16


def scaled_n_cells(n, target_occupancy=SEMDEDUP_TARGET_OCCUPANCY,
                   min_k=IVF_K):
    """Corpus-scaled centroid count: k = max(min_k, n // occupancy),
    so expected cell occupancy stays ~constant and the within-cell
    pair join is O(N * occupancy) -- linear in N -- instead of the
    O(N^2 / k) a fixed k degrades to.  Integer floor division on both
    sides (Python ``//`` == DuckDB ``//`` for non-negative ints), so
    the oracle reproduces k exactly from COUNT(*)."""
    return max(min_k, int(n) // int(target_occupancy))


def init_centroids(emb, k=IVF_K, n=None):
    """Deterministic FIXED-K centroid table ``(cell_id, cv)`` -- the
    Lloyd trainer's init pass, exposed standalone because it is both
    deterministic AND SQL-reproducible (unlike trained means, whose
    float summation is engine-ordered): centroids are corpus vectors
    selected by a corpus-spread stride filter, ranked by vec_id.

    This is the scale-correct IVF configuration: K is FIXED, so the
    broadcast assignment join is N x K however large the corpus grows
    (the ``centroids()`` stride sample, by contrast, grows K with
    N/stride and is kept only as a diagnostic).

    Under-fill guard: sparse/non-contiguous vec_ids can leave the
    stride filter with fewer than ``k`` survivors; the selection
    backfills with the smallest-vec_id rows so the table always has
    ``min(k, |emb|)`` rows.  Selection = global top-k by
    ``(stride_match DESC, vec_id ASC)``, computed scale-safely: the
    candidate pool is stride matches UNION the k smallest vec_ids
    (a TakeOrderedAndProject, no corpus-wide window), which provably
    contains the global top-k under that ordering.

    ``n``: pass a precomputed ``emb.count()`` to avoid a second count
    job when the caller already counted (the scaled-k dedup path).
    """
    if n is None:
        n = emb.count()
    stride = max(1, n // k)
    is_match = F.col("vec_id") % stride == CENTROID_MOD % stride
    pool = (
        emb.filter(is_match)
        .unionByName(emb.orderBy("vec_id").limit(k))
        .dropDuplicates(["vec_id"])
    )
    w = Window.orderBy(
        is_match.cast("int").desc(), F.col("vec_id").asc()
    )
    return (
        pool.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            (F.col("__rn") - 1).alias("cell_id"),
            F.col("v").alias("cv"),
        )
    )


def train_centroids(emb, k=16, n_iter=5):
    """Deterministic Lloyd-trained centroid table ``(cell_id, cv)`` for
    ``ivf_topk(centroids_df=...)``: stride-sampled init (reproducible),
    then ``n_iter`` rounds of assign + per-cell mean.

    Scale shape: each round is one broadcast-assign (N x k, k fixed --
    unlike the stride default whose K grows with N) plus one
    map-side-combinable groupBy(cell) mean; the k-row centroid table
    localCheckpoints between rounds so the plan stays O(1) deep.
    Cluster means use float summation, so trained centroids are
    deterministic within an engine but NOT bit-portable across
    engines -- which is why the ORACLE-checked queries keep the
    stride sample and this trainer is semantically tested instead
    (inertia must not increase round over round).  For a fully
    oracle-checked trainer, see ``kmeans_quantized``: integer
    quantization makes every Lloyd step order-independent and
    bit-portable at the cost of micro-unit precision.

    Empty cells keep their previous centroid (coalesce), matching the
    standard Lloyd degenerate-cell convention."""
    emb = emb.filter(F.size("v") == EMB_DIM)
    # init = the standalone deterministic fixed-K selection (with the
    # sparse-vec_id backfill guard); see init_centroids
    cents = init_centroids(emb, k=k).localCheckpoint()
    for _ in range(n_iter):
        assigned = assign_cells(emb, cents)
        # per-dimension F.sum columns: fully map-side-combinable (one
        # narrow shuffle of k x dim partial sums), no collect_list
        # memory proportional to cell size
        sums = [
            F.sum(F.get(F.col("v"), i)).alias(f"__s{i}")
            for i in range(EMB_DIM)
        ]
        means = (
            assigned.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("__n"), *sums)
            .select(
                "cell_id",
                F.array(
                    *[F.col(f"__s{i}") / F.col("__n")
                      for i in range(EMB_DIM)]
                ).alias("cv_new"),
            )
        )
        cents = (
            cents.join(means, "cell_id", "left")
            .select(
                "cell_id",
                F.coalesce("cv_new", "cv").alias("cv"),
            )
            .localCheckpoint()
        )
    return cents


def assign_cells(emb, cents):
    """Nearest-centroid (Voronoi) assignment.  Shape: corpus x
    broadcast centroids, then ONE map-side-combinable groupBy taking
    the lexicographic min of (d2, cell_id, v, label) -- (d2, cell_id)
    is unique per vector so the payload fields ride along without a
    join-back, and ties on d2 break deterministically on cell_id."""
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "d2", _d2(F.col("v"), F.col("cv"))
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cell_id", "v", "label")).alias("m")
    )
    return best.select(
        "vec_id",
        F.col("m.v").alias("v"),
        F.col("m.label").alias("label"),
        F.col("m.cell_id").alias("cell_id"),
    )


def ivf_topk(spark, sf_dir, k=TOP_K, n_queries=N_QUERIES,
             nprobe=NPROBE, centroids_df=None):
    """ANN via IVF-flat: Voronoi cells, nprobe-cell probe, exact
    cosine rerank inside the probed cells.

    ``centroids_df``: a trained/sampled ``(cell_id, cv)`` centroid
    table.  Pass one at real scale -- the default stride sample keeps
    the oracle deterministic but grows K with N/stride, making the
    broadcast assignment join O(N^2/stride); a trained table keeps K
    fixed (and tiny) regardless of corpus size."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    cents = centroids_df if centroids_df is not None else centroids(emb)
    assigned = assign_cells(emb, cents)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # nprobe nearest cells per query: |Q| x |centroids| is tiny
    qc = queries.crossJoin(F.broadcast(cents)).withColumn(
        "qd2", _d2(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy("qd2", "cell_id")
    probes = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    pairs = assigned.join(
        F.broadcast(probes),
        (assigned["cell_id"] == probes["cell_id"])
        & (assigned["vec_id"] != probes["query_id"]),
    ).drop(probes["cell_id"])
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("v"), F.col("qv"))
        / (_norm(F.col("v")) * _norm(F.col("qv"))),
    )
    return _topk(scored, k)


def ivf_trained_topk(spark, sf_dir, k=TOP_K, n_queries=N_QUERIES,
                     nprobe=NPROBE, n_cells=IVF_K):
    """The ORACLE-CHECKED scale configuration of IVF: ``ivf_topk``
    over the deterministic fixed-K ``init_centroids`` table.  The
    assignment join is N x ``n_cells`` with ``n_cells`` fixed -- the
    shape that survives a 100 TB corpus -- and every arithmetic step
    (stride init selection, squared-L2 argmin, cosine rerank) is
    bit-reproducible in SQL, so the path carries a full DuckDB oracle
    (``oracle_ops.ivf_trained_topk``).  The Lloyd-refined
    ``train_centroids`` table plugs into the same ``ivf_topk``
    signature when recall matters more than cross-engine
    reproducibility."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    # cents feeds TWO plan branches (corpus assignment + query
    # probing); localCheckpoint evaluates the init subtree once
    # instead of per branch (CLAUDE.md multi-branch-frame recipe)
    cents = init_centroids(emb, k=n_cells).localCheckpoint()
    return ivf_topk(
        spark, sf_dir, k=k, n_queries=n_queries, nprobe=nprobe,
        centroids_df=cents,
    )


def semantic_dedup(spark, sf_dir, threshold=0.2, n_cells=None,
                   target_occupancy=SEMDEDUP_TARGET_OCCUPANCY,
                   centroids_df=None):
    """SemDeDup-style embedding dedup (Abbas et al. 2023): cluster the
    corpus into Voronoi cells, compare ONLY within-cell pairs by exact
    cosine, and drop each vector that duplicates a smaller-id
    cell-mate (keeper = the minimum such id).  Output: one row per
    indexable vector ``(vec_id, cell_id, dup_of, is_kept)``.

    The cell bucketing replaces the quadratic all-pairs comparison
    with per-cell joins -- the same candidate-bounding role the
    hyperplane tables play in ``embedding_near_dup_pairs``, but keyed
    on learned/selected centroids, which groups semantically (cosine-
    close) rather than by random projections.

    DEFAULT = the SCALED configuration (round-4 verdict action #2):
    k = max(IVF_K, n // target_occupancy) derived from the corpus
    count, so expected cell occupancy stays ~constant and the
    within-cell pair join is O(N * occupancy) however large the
    corpus grows.  ``init_centroids`` is deterministic and
    SQL-reproducible for ANY k, so the full DuckDB oracle survives
    the scaling (it recomputes the same k from COUNT(*)).  Pass an
    explicit ``n_cells`` for the fixed-k form (diagnostic: its cell
    occupancy grows as N/k, degrading the pair join to O(N^2/k)), or
    a trained ``centroids_df`` when recall matters more than
    cross-engine reproducibility."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    if centroids_df is not None:
        cents = centroids_df
    else:
        if n_cells is None:
            n = emb.count()
            k = scaled_n_cells(n, target_occupancy)
            cents = init_centroids(emb, k=k, n=n).localCheckpoint()
        else:
            cents = init_centroids(emb, k=n_cells).localCheckpoint()
    assigned = assign_cells(emb, cents).localCheckpoint()
    a = assigned.select(
        "cell_id", F.col("vec_id").alias("ka"), F.col("v").alias("va")
    )
    b = assigned.select(
        "cell_id", F.col("vec_id").alias("kb"), F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, "cell_id")
        .filter(F.col("ka") < F.col("kb"))
        .filter(
            _dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb")))
            >= F.lit(float(threshold))
        )
    )
    dupof = pairs.groupBy(F.col("kb").alias("vec_id")).agg(
        F.min("ka").alias("dup_of")
    )
    return assigned.join(dupof, "vec_id", "left").select(
        "vec_id",
        "cell_id",
        "dup_of",
        F.col("dup_of").isNull().alias("is_kept"),
    )


def _bucket_expr(vcol, bits=N_HYPERPLANES, seed=HYPERPLANE_SEED):
    """Sign pattern over ``bits`` hyperplanes as a '01...' string."""
    planes = _hyperplanes(seed=seed, n=bits)
    out = []
    for row in planes:
        plane = F.array(*[F.lit(x).cast("double") for x in row])
        out.append(
            F.when(_dot(F.col(vcol), plane) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*out)


def hyperplane_buckets(emb, vcol="v", n_tables=1, bits=N_HYPERPLANES,
                       base_seed=HYPERPLANE_SEED):
    """(all input columns, table, bucket): one row per (vector,
    table), bucket = the sign pattern under that table's hyperplane
    set (seed = ``base_seed + table``, so table 0 with the defaults
    reproduces the original single-table buckets).

    This is the banded multi-table form (same OR-of-tables shape as
    the MinHash ``lsh_bands`` path): each table is ``bits`` wide, so
    expected occupancy is N / 2^bits per table, and a pair is a
    candidate if it collides in ANY table.  Narrow projection -- the
    bucketing is computed before any join, Catalyst-only."""
    tables = [
        F.struct(
            F.lit(t).alias("table"),
            _bucket_expr(vcol, bits=bits, seed=base_seed + t)
            .alias("bucket"),
        )
        for t in range(n_tables)
    ]
    return emb.select(
        "*", F.explode(F.array(*tables)).alias("__tb")
    ).select("*", "__tb.table", "__tb.bucket").drop("__tb")


def embedding_near_dup_candidates(emb, n_tables=1, bits=N_HYPERPLANES,
                                  base_seed=HYPERPLANE_SEED):
    """Distinct candidate (vec_a, vec_b) pairs colliding in >= 1
    table.  Only (vec_id, table, bucket) crosses the join -- vectors
    are joined back for verification afterwards, so the bucket join
    stays narrow at scale."""
    bk = hyperplane_buckets(
        emb.select("vec_id", "v"), "v", n_tables, bits, base_seed
    ).select("vec_id", "table", "bucket")
    a = bk.select(F.col("vec_id").alias("vec_a"), "table", "bucket")
    b = bk.select(F.col("vec_id").alias("vec_b"), "table", "bucket")
    pairs = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    if n_tables > 1:
        # cross-table repeat collisions exist only with >1 table; at
        # n_tables=1 a pair collides at most once, so the dedup
        # shuffle would be a provable no-op
        pairs = pairs.distinct()
    return pairs


def embedding_near_dup_pairs(spark, sf_dir, threshold=0.2, n_tables=1,
                             bits=N_HYPERPLANES):
    """Embedding-cosine near-duplicate PAIRS (the dedup-flavored
    variant of ANN): all pairs sharing a hyperplane-LSH bucket in any
    of ``n_tables`` tables, with cosine >= threshold.  The bucket
    equi-join replaces the quadratic all-pairs comparison -- same
    100 TB shape as the MinHash LSH text path, with the exact cosine
    verification restricted to the candidate survivors.

    At scale pick ``bits ~ log2(N / target_bucket_size)`` and recover
    recall with more tables (see module docstring); the defaults
    reproduce the original single-table 8-bit contract query."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    cand = embedding_near_dup_candidates(emb, n_tables, bits)
    va = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("v").alias("va"))
    vb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("v").alias("vb"))
    scored = cand.join(va, "vec_a").join(vb, "vec_b").withColumn(
        "cosine",
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))),
    ).filter(F.col("cosine") >= threshold)
    return scored.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


def lsh_ann_topk(spark, sf_dir, k=TOP_K, n_queries=N_QUERIES,
                 n_tables=1, bits=N_HYPERPLANES):
    """ANN via random-hyperplane buckets + exact rerank in-bucket,
    optionally over ``n_tables`` banded tables (candidates = corpus
    vectors colliding with the query in ANY table; duplicates across
    tables collapse before the rerank).

    The hyperplanes are EMB_DIM-dimensional; vectors of any other size
    are not indexable and are excluded (Spark's zip_with would silently
    null-pad, DuckDB errors -- both wrong)."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    bk = hyperplane_buckets(
        emb.select("vec_id", "v"), "v", n_tables, bits
    )
    queries = bk.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    cand = (
        bk.select("vec_id", "table", "bucket")
        .join(
            F.broadcast(queries.drop("qv")),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("table") == F.col("qtable"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
    )
    q_vecs = queries.select("query_id", "qv")
    if n_tables > 1:
        # collapse multi-table collisions (narrow ids only); at one
        # table both frames are already duplicate-free
        cand = cand.distinct()
        q_vecs = q_vecs.distinct()
    scored = cand.join(F.broadcast(q_vecs), "query_id").join(
        emb.select("vec_id", "v"), "vec_id"
    ).withColumn(
        "cosine",
        _dot(F.col("v"), F.col("qv"))
        / (_norm(F.col("v")) * _norm(F.col("qv"))),
    )
    return _topk(scored, k)


KMEANS_SCALE = 1_000_000
KMEANS_ITER = 2


def kmeans_quantized(emb, k=IVF_K, n_iter=KMEANS_ITER,
                     scale=KMEANS_SCALE):
    """Lloyd k-means over INTEGER-QUANTIZED embeddings -- the
    bit-portable trainer: vectors are quantized per-dimension to
    ``floor(scale * x)`` micro-units, so squared-L2 distances,
    cluster sums, and floored-division means are exact integer
    arithmetic, order-independent, and therefore identical across
    engines (closing the float-summation caveat documented on
    ``train_centroids``, which remains the full-precision variant).

    Init = ``init_centroids`` (deterministic stride selection is
    value-independent, so quantizing after selection matches the
    oracle); each round assigns by integer squared-L2 argmin with
    (d2, cell_id) ties, then recomputes centroids as the
    elementwise FLOORED integer mean ``(s - pmod(s, n)) div n``
    (exact: the pmod subtraction makes the division remainder-free,
    the same portable-floor recipe as the micro-nat operators).
    Empty cells keep their previous centroid.  Output, one row per
    cell after a final assignment: ``(cell_id, n_members,
    inertia_q, centroid)`` with the integer inertia (decimal-summed,
    stringified -- sums exceed int64 at corpus scale) and the
    quantized centroid serialized as a comma-joined string.

    Scale shape: each round is one broadcast N x k assignment (k
    fixed) + one map-side-combinable per-cell groupBy of 64
    per-dimension integer sums; the k-row centroid table
    localCheckpoints between rounds so the plan stays O(1) deep.
    Integer-exactness bound: |x| <= ~10 keeps per-vector d2 under
    2^48, exact in the oracle's double-based dot products."""
    emb = emb.filter(F.size("v") == EMB_DIM)
    quant = lambda c: F.transform(
        c, lambda x: F.floor(x * scale).cast("long")
    )
    qemb = emb.select("vec_id", quant(F.col("v")).alias("qv"))
    cents = (
        init_centroids(emb, k=k)
        .select("cell_id", quant(F.col("cv")).alias("qcv"))
        .localCheckpoint()
    )

    def _assign(frame, cents_df):
        d2 = F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("qcv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        scored = frame.crossJoin(F.broadcast(cents_df)).withColumn(
            "d2", d2
        )
        best = scored.groupBy("vec_id").agg(
            F.min(F.struct("d2", "cell_id", "qv")).alias("m")
        )
        return best.select(
            "vec_id",
            F.col("m.qv").alias("qv"),
            F.col("m.cell_id").alias("cell_id"),
            F.col("m.d2").alias("d2"),
        )

    sums = [
        F.sum(F.get(F.col("qv"), i)).alias(f"__s{i}")
        for i in range(EMB_DIM)
    ]
    for _ in range(n_iter):
        assigned = _assign(qemb, cents)
        means = (
            assigned.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("__n"), *sums)
            .select(
                "cell_id",
                F.array(*[
                    F.expr(
                        f"(__s{i} - pmod(__s{i}, __n)) div __n"
                    ).cast("long")
                    for i in range(EMB_DIM)
                ]).alias("__new_qcv"),
            )
        )
        cents = (
            cents.join(means, "cell_id", "left")
            .select(
                "cell_id",
                F.coalesce("__new_qcv", "qcv").alias("qcv"),
            )
            .localCheckpoint()
        )
    final = _assign(qemb, cents)
    stats = final.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("d2").cast("decimal(38,0)")).alias("__inertia"),
    )
    return (
        cents.join(stats, "cell_id", "left")
        .select(
            "cell_id",
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
            F.coalesce(
                F.col("__inertia").cast("string"), F.lit("0")
            ).alias("inertia_q"),
            F.array_join(
                F.transform(F.col("qcv"), lambda x: x.cast("string")),
                ",",
            ).alias("centroid"),
        )
    )
