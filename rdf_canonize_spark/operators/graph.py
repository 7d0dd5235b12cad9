"""Iterative graph algorithms over the entity graph.

Connected components via hash-min label propagation: every node starts
labeled with itself; each round every node takes the min label in its
closed neighborhood; converged when no label changes.  Rounds needed =
graph diameter (co-mention graphs are small-world, so typically <10).

Scale notes (the 100 TB contract):

* each round is one shuffle (groupBy dst) over the edge list -- no
  driver-side adjacency, no collect;
* ``localCheckpoint`` every round truncates the lineage, otherwise the
  plan doubles per iteration and the DAG scheduler, not the data,
  becomes the bottleneck;
* convergence check is a single count of changed labels (cheap agg);
* for power-law graphs at extreme scale the large-star/small-star
  variant (Kiveris et al., "Connected Components in MapReduce") halves
  round count; plain hash-min is kept here because entity graphs
  converge in single-digit rounds and each round is one shuffle either
  way.

The driver-contract query ``entity_components`` oracle-checks this
against a DuckDB recursive CTE (transitive closure + MIN) -- exact
equality, since min-label is order-independent.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def connected_components(edges_df, src="src", dst="dst", max_iter=25):
    """(node, component) for the undirected graph of ``edges_df``;
    component = min node id (lexicographic for strings) in the
    component.  Isolated endpoints appear with themselves as component.

    Convergence is detected by a zero-change round, so ``max_iter``
    must be at least graph diameter + 1: labels stop changing after
    ``diameter`` rounds and one further round observes that.
    """
    if max_iter < 1:
        raise ValueError(
            "connected_components needs max_iter >= 1 (convergence "
            "detection requires at least one propagation round)"
        )
    e = edges_df.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = None
    for _ in range(max_iter):
        # min label over the closed neighborhood: neighbor labels
        # (join on the edge) unioned with own label
        neighbor_min = (
            und.join(labels, und["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        merged = labels.join(neighbor_min, "node").localCheckpoint()
        changed = merged.filter(
            F.col("label") != F.col("new_label")
        ).count()
        labels = merged.select(
            "node", F.col("new_label").alias("label")
        ).localCheckpoint()
        if changed == 0:
            break
    if changed:
        # Falling through with unmerged labels would silently return
        # split components; surface it -- the caller can raise max_iter
        # (rounds needed = graph diameter + 1: the final round must
        # observe zero changes).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds ({changed} labels still changing); needs "
            f"max_iter >= graph diameter + 1"
        )
    return labels.select("node", F.col("label").alias("component"))


def pagerank(edges_df, src="src", dst="dst", n_iter=10, damping=0.85):
    """PageRank over the directed graph of ``edges_df`` (duplicate
    edges collapse), with uniform dangling-mass redistribution:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + DM/N)

    where DM is the total rank held by nodes with no out-edges.

    Scale shape: one edge-keyed shuffle per iteration
    (contribution join + dst aggregation), the dangling mass is a
    1-row aggregate cross-joined back (never collected to the driver),
    and ``localCheckpoint`` truncates the per-iteration lineage so the
    DAG stays O(1) per round.  Ranks are floats; callers that need
    engine-portable equality round the output (the driver oracle
    unrolls the same iterations in SQL and rounds at 6).

    Tolerance note: the per-node contribution SUM has engine- and
    partition-order-dependent float summation order, while the oracle
    sums in a fixed order.  ``round(rank, 6)`` absorbs the ~1e-16
    relative drift in practice, but a sum landing exactly on a rounding
    boundary can in principle differ in the last digit -- exact string
    equality against the oracle is therefore a high-probability
    contract, not a mathematical identity; epsilon comparison is the
    robust form for external consumers.
    """
    e = (
        edges_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:  # empty graph: empty (node, rank) result, no 1/0
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, "node", "left")
        dm = with_deg.agg(
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("dm")
        )
        contribs = (
            e.join(
                with_deg.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("contrib"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("in_contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(dm)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (
                        F.coalesce("in_contrib", F.lit(0.0))
                        + F.col("dm") / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
