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
* ``lsh_ann_topk`` -- random-hyperplane LSH: 8 deterministic
  pseudo-hyperplanes (seeded), sign pattern = bucket key, exact rerank
  within bucket.  Hyperplane components are literals, so the same
  buckets are SQL-derivable.
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


def centroids(emb, stride=CENTROID_STRIDE, mod=CENTROID_MOD):
    """Deterministic sampled centroids (IVF training stand-in):
    every ``stride``-th corpus vector.  cell_id = the centroid's
    vec_id.  At real scale pass an explicitly trained/sampled centroid
    table instead -- everything downstream only needs (cell_id, cv)."""
    return emb.filter(
        F.col("vec_id") % stride == mod
    ).select(F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"))


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
             nprobe=NPROBE):
    """ANN via IVF-flat: computed Voronoi cells, nprobe-cell probe,
    exact cosine rerank inside the probed cells."""
    emb = _load(spark, sf_dir).filter(F.size("v") == EMB_DIM)
    cents = centroids(emb)
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


def _bucket_expr(vcol):
    """Sign pattern over the hyperplanes as a '01...' string."""
    planes = _hyperplanes()
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(x).cast("double") for x in row])
        bits.append(
            F.when(_dot(F.col(vcol), plane) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*bits)


def embedding_near_dup_pairs(spark, sf_dir, threshold=0.2):
    """Embedding-cosine near-duplicate PAIRS (the dedup-flavored
    variant of ANN): all pairs sharing a hyperplane-LSH bucket with
    cosine >= threshold.  The bucket equi-join replaces the quadratic
    all-pairs comparison -- same 100 TB shape as the MinHash LSH text
    path, with the exact cosine verification restricted to bucket
    cohabitants."""
    emb = (
        _load(spark, sf_dir)
        .filter(F.size("v") == EMB_DIM)
        .withColumn("bucket", _bucket_expr("v"))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))),
    ).filter(F.col("cosine") >= threshold)
    return scored.select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


def lsh_ann_topk(spark, sf_dir, k=TOP_K, n_queries=N_QUERIES):
    """ANN via random-hyperplane buckets + exact rerank in-bucket.

    The hyperplanes are EMB_DIM-dimensional; vectors of any other size
    are not indexable and are excluded (Spark's zip_with would silently
    null-pad, DuckDB errors -- both wrong)."""
    emb = (
        _load(spark, sf_dir)
        .filter(F.size("v") == EMB_DIM)
        .withColumn("bucket", _bucket_expr("v"))
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = emb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("v"), F.col("qv"))
        / (_norm(F.col("v")) * _norm(F.col("qv"))),
    )
    return _topk(scored, k)
