"""Iterative graph operators over a pair/edge DataFrame: connected
components (the clustering step that turns near-duplicate PAIRS from
MinHash/Jaccard/SimHash into duplicate GROUPS so a training-data
pipeline can keep one representative per cluster) and weighted
PageRank.

Algorithm: iterative min-label propagation (each node adopts the
smallest label among itself and its neighbors) — converges in
O(component diameter) rounds, which for near-dup clusters (small, dense)
is 2-4. Each round is one shuffle (join on node id) + one aggregation;
lineage is cut per round with ``localCheckpoint`` so the plan doesn't
grow exponentially. At 100 TB this is the same shape GraphX/GraphFrames
use; for graphs with giant components switch to large-star/small-star
(fewer rounds), but duplicate clusters are never giant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, label) with label = min node id of the component.

    Only nodes appearing in ``edges`` are labeled (isolated nodes are
    their own trivial clusters — callers add them back if needed).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # labels only ever decrease, so the (exact, overflow-proof) label
    # checksum strictly decreases until the fixpoint — comparing it
    # round-over-round replaces a join-based changed? probe with a
    # single aggregate on the already-materialized frame
    def _checksum(lb: DataFrame):
        return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sum = _checksum(labels)
    for _ in range(max_iter):
        # one round = ONE join: neighbor labels (messages along edges)
        # unioned with each node's own label, then a single min-agg —
        # the self-label union replaces the second (left) join of the
        # naive formulation
        msgs = sym.join(labels, sym.b == F.col("node")).select(
            F.col("a").alias("node"), "label"
        )
        new_labels = (
            msgs.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        new_sum = _checksum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Weighted PageRank: (node, rank), ranks summing to 1.

    Power iteration as DataFrame ops: each round joins ranks to the
    out-normalized edge list, sums contributions per destination (one
    shuffle, map-side combined), adds the teleport term plus the
    redistributed mass of dangling nodes (computed as total minus
    emitted mass — no extra anti-join), and cuts lineage with
    ``localCheckpoint`` so the iterated plan stays constant-size.
    Convergence is checked on the L1 delta every round; at 100 TB the
    per-round cost is exactly one edge-list join + one aggregation,
    the same shape GraphX's Pregel emits.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contribs = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("contrib"))
        )
        emitted = contribs.agg(F.sum("contrib")).first()[0] or 0.0
        dangling = 1.0 - emitted  # mass at nodes with no out-edges
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks


def triangle_count(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Global triangle count of an undirected graph, 1-row output.

    Classic degree-ordered orientation: every undirected edge is
    directed from its lower-degree endpoint to the higher (ties broken
    by id), which caps each vertex's out-degree at O(sqrt(|E|)) — the
    wedge join (out-neighbors × out-neighbors) then enumerates each
    triangle exactly once and never fans out on a skewed hub vertex.
    Two shuffles: the wedge self-join on the pivot vertex and the
    closing-edge semi join.  A naive undirected 3-way join counts each
    triangle 6 times and squares on hub degrees — the orientation is
    what survives a power-law graph at scale."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, id): lower-rank endpoint -> higher
    with_deg = (
        und.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    w1 = oriented.select(F.col("s").alias("p"), F.col("t").alias("x"))
    w2 = oriented.select(F.col("s").alias("p"), F.col("t").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
    ).distinct()
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    return tris.agg(F.count("*").alias("n_triangles"))
