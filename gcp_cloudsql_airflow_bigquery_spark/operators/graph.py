"""Connected components over a pair/edge DataFrame — the clustering
step that turns near-duplicate PAIRS (MinHash/Jaccard/SimHash output)
into duplicate GROUPS so a training-data pipeline can keep one
representative per cluster.

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
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
