"""Distributed connected components over a pair/edge frame.

One operator, two mandated uses:

* **dedup group assignment** — MinHash/SimHash/Jaccard pipelines emit
  duplicate PAIRS; turning pairs into canonical groups (each doc labeled
  with its group's min id) is a connected-components problem;
* **spatial clustering** — ST_ClusterWithin semantics at frame scale:
  clusters are the components of the "within distance d" graph
  (``dwithin_join_points_points`` emits exactly those edges).

Algorithm: iterative min-label propagation with POINTER JUMPING — each
round every node takes the min label over its neighbors' labels, then
labels are compressed one hop (label := label(label)).  The jump step
gives the classic O(log n)-round convergence on chains (plain
propagation needs O(diameter) rounds); each round is two shuffle joins
plus an aggregation, all Catalyst.

Iterative-Spark pitfalls handled explicitly:

* **lineage truncation** — the jump step self-joins the round's frame,
  so the logical plan would DOUBLE per round (exponential analysis cost;
  ``persist`` alone does not truncate the plan Catalyst re-analyzes).
  Each round ends in ``localCheckpoint(eager=True)``, which both
  materializes the round and cuts the plan back to a leaf.
* **cheap convergence test** — labels are elementwise non-increasing, so
  the label SUM strictly decreases until the fixpoint; one tiny
  aggregate per round replaces an old-vs-new join.

Determinism: the final label of every node is the MINIMUM node id in its
component — independent of join order or partitioning, hence exactly
reproducible by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    = min node id of its connected component.  Isolated nodes of the
    graph do not appear (callers union them back with label=self)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iters):
        # min over own label and neighbors' labels
        neigh = (
            e.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new = labels.join(neigh, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # pointer jump: label := label(label)
        jumped = (
            new.alias("x")
            .join(
                new.select(
                    F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("y"),
                "lbl",
                "left",
            )
            .select(
                F.col("node"),
                F.coalesce(F.col("lbl2"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        labels = jumped
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("lbl").alias("component"))
