"""Connected components over near-duplicate pair graphs.

The step every dedup pipeline needs after pair generation: near-dup PAIRS
(minhash-LSH / simhash / winnowing) must become duplicate CLUSTERS before
a keep-one-per-cluster decision can be made — pairs alone double-drop
documents linked through a chain (A~B, B~C: naive pair-wise dropping can
remove all three).

Algorithm: iterative min-label propagation — each node's label starts as
its own id and converges to the minimum id in its component. This is the
standard large-graph CC on Spark (the GraphX/GraphFrames formulation, here
in plain DataFrame ops so Catalyst handles it):

- per iteration: one equi-join (labels onto edge endpoints) + one groupBy
  min — both shuffle on node id, and AQE handles skewed hub nodes;
- iterations needed = graph diameter; near-dup clusters are shallow
  (duplicates of duplicates), so convergence is typically 2-4 rounds;
- ``localCheckpoint`` truncates lineage each round so plans stay flat;
- convergence test is a scalar aggregate (count of changed labels), never
  a data collect — driver traffic is O(1) per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """Component label per node -> (id, component).

    ``component`` is the minimum node id in the node's connected
    component. Only nodes that appear in ``edges`` are labeled (isolated
    documents are no-ops for dedup clustering).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).cache()
    labels = (
        und.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                "id",
                F.least("comp", F.coalesce("nbr_min", "comp")).alias("comp"),
                (F.coalesce("nbr_min", "comp") < F.col("comp")).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = stepped.filter("changed").count()
        labels = stepped.select("id", "comp")
        if n_changed == 0:
            break
    else:
        # exhausting max_iter with labels still moving means components
        # with diameter > max_iter would be returned SPLIT — silently
        # wrong dedup clusters. Fail loudly instead.
        und.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({n_changed} labels still changing) — the graph has a component "
            "with diameter > max_iter; raise max_iter (propagation is one hop "
            "per iteration) or pre-contract obvious duplicates"
        )
    und.unpersist()
    return labels.select("id", F.col("comp").alias("component"))
