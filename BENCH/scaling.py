"""Scaling-efficiency evidence: identical flagship job at local[N] vs local[4N].

BASELINE.json's two-cluster-size criterion (throughput scaling efficiency
≥ 0.8 between N and 4N executors) cannot use a real cluster in this sandbox;
per the task protocol it is evidenced by running the SAME job at two local
parallelism levels on the SAME input and reporting throughput at both.

Usage: python BENCH/scaling.py [--sf 1.0] [--n 8] [--runs 3]
Writes BENCH/BASELINE.md with the measured numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from jena_geo_spark.session import get_spark
from jena_geo_spark import datagen
from jena_geo_spark.operators.spatial_join import build_zone_covers, spatial_join_points_zones
from jena_geo_spark.operators.tiling import assign_tiles, repartition_by_tile
from jena_geo_spark.image.spark import with_phash_verified

cpus = int(sys.argv[1]); runs = int(sys.argv[2]); sf = float(sys.argv[3])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8))
d = datagen.ensure_dataset(sf)
imgs = spark.read.parquet(f"{{d}}/images.parquet").select(
    "image_id","caption","lon","lat","cell_fine","bytes","w","h","fmt","phash")
n = imgs.count()
zones = [(r.zone_id, r.geom_wkt) for r in spark.read.parquet(f"{{d}}/zones.parquet").collect()]
covers = build_zone_covers(zones)
def noop(df): df.write.format("noop").mode("overwrite").save()
def pipeline():
    # full north-star pipeline: decoded-pixel invariant verified at ingest
    # (once per row, BEFORE the join duplicates rows per zone), then the
    # cell-cover spatial join, then tile assignment + shuffle
    v = with_phash_verified(imgs).filter(F.col("phash_ok")).drop("bytes","w","h","fmt")
    j = spatial_join_points_zones(spark, v, covers)
    return repartition_by_tile(assign_tiles(j, tile_res=6))
noop(pipeline())  # warmup: python workers + page cache
ts = []
for _ in range(runs):
    t0 = time.perf_counter(); noop(pipeline()); ts.append(time.perf_counter() - t0)
ts.sort()
med = ts[len(ts)//2]
print(json.dumps({{"cpus": cpus, "n_rows": n, "median_sec": round(med,3),
                   "all_sec": [round(t,3) for t in ts],
                   "rows_per_sec": round(n/med,1)}}))
spark.stop()
"""


def run_level(cpus: int, runs: int, sf: float) -> dict:
    job = _JOB.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", job, str(cpus), str(runs), str(sf)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=2.0)
    # N=4 vs 4N=16: both levels fit inside the 32-core sandbox host
    # (JVM task threads + python UDF workers) without oversubscription,
    # mimicking two cluster sizes whose executors don't share a box
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    # pre-generate the dataset so neither level pays generation cost
    sys.path.insert(0, REPO)
    from jena_geo_spark import datagen

    t0 = time.time()
    datagen.ensure_dataset(args.sf)
    print(f"dataset ready in {time.time()-t0:.1f}s", file=sys.stderr)

    # interleave the two levels (N, 4N, N, 4N, …): the sandbox VM's CPU
    # capacity drifts ±20% over minutes, so back-to-back blocks of one level
    # bias the comparison — alternating rounds expose both levels to the
    # same drift.  Per-level stat = median over all measured runs.
    lo_times: list[float] = []
    hi_times: list[float] = []
    n_rows = 0
    rounds = max(1, (args.runs + 1) // 2)
    per_round_eff = []
    for _ in range(rounds):
        lo = run_level(args.n, 2, args.sf)
        hi = run_level(args.n * 4, 2, args.sf)
        lo_times += lo["all_sec"]
        hi_times += hi["all_sec"]
        n_rows = lo["n_rows"]
        per_round_eff.append(
            round((lo["median_sec"] / hi["median_sec"]) / 4.0, 3)
        )
    lo_times.sort()
    hi_times.sort()
    lo_med = lo_times[len(lo_times) // 2]
    hi_med = hi_times[len(hi_times) // 2]
    lo = {"cpus": args.n, "n_rows": n_rows, "median_sec": lo_med,
          "all_sec": lo_times, "rows_per_sec": round(n_rows / lo_med, 1)}
    hi = {"cpus": args.n * 4, "n_rows": n_rows, "median_sec": hi_med,
          "all_sec": hi_times, "rows_per_sec": round(n_rows / hi_med, 1)}
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
    result = {"N": lo, "4N": hi, "efficiency": round(eff, 3),
              "per_round_efficiency": per_round_eff}
    print(json.dumps(result))

    md = f"""# BENCH baseline — spatial-join + tile-assignment throughput

Flagship pipeline: image+caption table → decoded-pixel invariant
verification (phash recompute from decoded PNG/raw payloads, BASELINE's
per-row gate) → cell-cover broadcast spatial join against the zone polygon
set → exact PIP refine → tile assignment → repartition by tile (noop sink;
steady-state after a warmup pass; {len(lo['all_sec'])} measured runs per
level, gathered in {rounds} interleaved N→4N rounds, median reported).

Input: deterministic synthetic images table, sf={args.sf}
({lo['n_rows']:,} rows), zones = 12 polygons incl. the jena-geo reference
house geometry.

## Two-parallelism scaling evidence (sandbox protocol for the N vs 4N rule)

| parallelism | median sec | rows/sec |
|---|---|---|
| local[{args.n}]  (N)  | {lo['median_sec']} | {lo['rows_per_sec']:,} |
| local[{args.n*4}] (4N) | {hi['median_sec']} | {hi['rows_per_sec']:,} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)

All runs (levels interleaved across rounds to cancel the sandbox VM's
±20% CPU drift): N={lo['all_sec']} · 4N={hi['all_sec']} (seconds);
per-round efficiency: {per_round_eff}

Reproduce: `python BENCH/scaling.py --sf {args.sf} --n {args.n} --runs {args.runs}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
