"""Reproducible connected-components benchmark at sf>=1 scale.

The r3 verdict asked for the 2M-node/9-round measurement to live in a
rerunnable script instead of a COVERAGE.md claim.  Two deterministic
graphs (no RNG — hash-derived, same every run):

* ``chain``  — a single path of N nodes (diameter N-1): the adversarial
  case for label propagation; pointer jumping must close it in
  ~log2(N) rounds, not N.
* ``dedup``  — the shape the operator serves in production (doc dedup
  groups): N nodes in clusters of ~5 via hash buckets, 2 edges per node
  inside its cluster; diameter is tiny, rounds should be ~constant.

Prints ONE JSON line:
  {"graphs": {"chain": {"nodes":..., "edges":..., "rounds":..., "sec":...,
   "nodes_per_sec":...}, "dedup": {...}}, "cpus":...}

Usage: python BENCH/components.py [--nodes 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jena_geo_spark.operators.components import connected_components  # noqa: E402
from jena_geo_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--chain-nodes", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark(
        "jena-geo-components-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    out: dict = {"graphs": {}, "cpus": args.cpus}

    def run(name: str, edges, n_nodes: int) -> None:
        edges = edges.localCheckpoint(eager=True)  # pin inputs outside timing
        n_edges = edges.count()
        stats: dict = {}
        connected_components(edges, max_iters=64, stats=stats).write.format(
            "noop"
        ).mode("overwrite").save()  # warm (JIT/codegen/workers)
        stats.clear()
        t0 = time.perf_counter()
        connected_components(edges, max_iters=64, stats=stats).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.perf_counter() - t0
        out["graphs"][name] = {
            "nodes": n_nodes,
            "edges": n_edges,
            "rounds": stats["rounds"],
            "sec": round(dt, 3),
            "nodes_per_sec": round(n_nodes / dt, 1),
        }

    n = args.chain_nodes
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    run("chain", chain, n)

    # dedup-shaped: node i joins cluster hash(i)//~(N/5 clusters); each node
    # emits edges to two deterministic peers of its cluster
    n = args.nodes
    clusters = n // 5
    base = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(clusters)).alias("c"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)).alias("r"),
    )
    # edge to the cluster's min node (star) + to a hash-ranked neighbor —
    # 2N edges, components == hash buckets
    mins = base.groupBy("c").agg(F.min("id").alias("root"))
    star = base.join(mins, "c").where(F.col("id") != F.col("root")).select(
        F.col("id").alias("src"), F.col("root").alias("dst")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("c").orderBy("r", "id")
    ring = (
        base.withColumn("nxt", F.lag("id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("id").alias("src"), F.col("nxt").alias("dst"))
    )
    run("dedup", star.unionByName(ring), n)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
