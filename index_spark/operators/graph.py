"""Connected components for duplicate-cluster resolution.

LSH/SimHash near-dup detection emits *pairs*; a training-data pipeline needs
*clusters* (keep one survivor per group of transitively-linked documents).
That is connected components over the pair graph, with the canonical cluster
id = the minimum member id.

Scale notes: this is min-label propagation — each round is one shuffle
(join on the edge key + groupBy min), and it converges in graph-diameter
rounds. Near-dup graphs are shallow (dupes link to an original, diameters
of a few), so the round count is small and data-independent-ish. For
adversarial deep graphs at 100 TB, swap the loop body for the
large-star/small-star alternation (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log n) rounds over the same
primitives. Each round ``localCheckpoint``s to truncate lineage — without it
the plan doubles per iteration and the driver, not the data, becomes the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Return (id, label) with ``label`` = min node id of each component.

    ``edges`` are undirected pairs; isolated nodes don't appear (every id in
    ``edges`` does, on either side). Raises if not converged in ``max_iter``
    rounds — near-dup graphs converge in a handful.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: the edge list is re-joined every round, and the
        # upstream plan (LSH candidate join + Jaccard verify for near-dup
        # input) would otherwise re-run per iteration
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iter):
        nbr = und.join(labels, und["b"] == labels["id"]).select(
            und["a"].alias("id"), F.col("label")
        )
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
