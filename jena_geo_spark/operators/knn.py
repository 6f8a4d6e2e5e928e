"""Grid-pruned k-nearest-neighbour search.

The reference's ``Near`` function is an unimplemented stub
(``geometry/Near.java:6-13`` returns null); the geosparql-jena dependency's
``spatial:nearby`` runs against a single-JVM in-memory index.  Distributed
re-architecture (BASELINE north_star: "grid-pruned kNN — k-ring expansion
with distance-sorted candidate heaps"):

1. each query point gets a k-ring of cells at a chosen resolution
   (ring radius grown until the ring *guarantees* ≥k candidates AND the
   ring fully contains the k-th distance — verified, not assumed);
2. the ring cells are broadcast; data points equi-join on their cell id
   (pure-Catalyst ancestor derivation, no point-side shuffle);
3. per-query top-k via a single narrow ``groupBy(query_id)`` aggregation
   over candidates only (candidate count ≪ N).

Correctness guard: after ranking, the k-th nearest distance must be ≤ the
ring's guaranteed-coverage radius; otherwise the ring is expanded and the
query re-run (driver loop — queries are few, data is huge).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import grid
from .spatial_join import FINE_RES, ancestor_col, with_point_cells


def knn_join(
    spark,
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    ring_res: int | None = None,
    ring_k: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "event_id",
    max_expand: int = 24,
    fine_res: int = FINE_RES,
    n_hint: int | None = None,
) -> DataFrame:
    """Top-k nearest data points for each query point.

    Output: (query_id, {id_col}, dist, rank) with deterministic
    (dist, id) tie-break.  Distances are planar (coordinate units) —
    matches the SQL oracle exactly.

    Expansion strategy: start at a density-derived resolution (expected ring
    candidates ≈ 4k); if the k-th distance is not provably inside the ring,
    coarsen the resolution (cell size doubles, candidate area ×4) and retry.
    Each retry is a fresh narrow broadcast join — the big point table is
    never shuffled.
    """
    if ring_res is None:
        n = n_hint if n_hint is not None else points.count()
        density = max(n, 1) / (360.0 * 180.0)  # rows per deg² (uniform est.)
        side = 2 * ring_k + 1
        # cell width w such that density * (side*w)² ≈ 4k
        w = np.sqrt(4.0 * k / max(density, 1e-12)) / side
        ring_res = int(np.clip(np.floor(np.log2(360.0 / max(w, 1e-9))), 0, 20))
    ring = ring_k
    encoded = with_point_cells(points, lon, lat, fine_res)  # hoisted: UDF-free loop
    for _ in range(max_expand):
        rows = []
        for qid, qx, qy in queries:
            center = int(grid.encode_points(np.array([qx]), np.array([qy]), ring_res)[0])
            for c in grid.k_ring(center, ring):
                rows.append((qid, float(qx), float(qy), int(c)))
        ring_df = spark.createDataFrame(
            rows, "query_id string, qx double, qy double, cell long"
        )

        pts = encoded.withColumn(
            "cell", ancestor_col(F.col("cell_fine"), fine_res, ring_res)
        )
        cand = pts.join(F.broadcast(ring_df), on="cell", how="inner")
        dx = F.col(lon) - F.col("qx")
        dy = F.col(lat) - F.col("qy")
        cand = cand.withColumn("dist2", dx * dx + dy * dy)
        w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(id_col).asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                id_col,
                F.sqrt(F.col("dist2")).alias("dist"),
                "rank",
            )
        )
        topk = topk.localCheckpoint(eager=True)
        # guard: ring guarantees correctness iff kth distance fits inside the
        # ring's inscribed radius (ring reaches at least `ring` cells out in
        # every direction; cell height is the binding dimension)
        stats = (
            topk.groupBy("query_id").agg(F.max("dist").alias("dmax"), F.count("*").alias("n"))
        ).collect()
        cell_h = 180.0 / (1 << ring_res)
        cell_w = 360.0 / (1 << ring_res)
        safe_r = ring * min(cell_w, cell_h)
        whole_world = ring_res == 0 and ring >= 1  # ring spans every cell
        ok = whole_world or (
            len(stats) == len(queries)
            and all(r["n"] >= min(k, 1) and r["dmax"] <= safe_r for r in stats)
        )
        if ok:
            return topk
        # (checkpoint blocks of the failed round are GC-released once the
        # frame goes out of scope — no explicit unpersist needed)
        if ring_res > 0:
            ring_res -= 1  # coarsen: same cell count, double the radius
        else:
            ring *= 2
    raise RuntimeError("knn ring expansion exceeded max_expand")


def knn_join_frames(
    spark,
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str = "id",
    right_id: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    start_res: int | None = None,
    n_hint: int | None = None,
    max_iters: int = 24,
) -> DataFrame:
    """Frame-scale kNN join: the k nearest RIGHT rows for EVERY left row —
    the table×table generalisation of ``knn_join`` (whose query side is a
    driver list).  Nothing is per-row on the driver; the driver only runs
    the resolution-expansion loop (≤ ``max_iters`` distributed rounds).

    Round structure (all Catalyst):
    1. grid-bucket candidate join at the current resolution — left keyed
       by its (ix,iy) cell, right exploded to its 3×3 neighborhood (the
       ``dwithin_join_points_points`` plan shape);
    2. per-left top-k window over candidates (dist², id tie-break);
    3. a left row is DONE when it has ≥k candidates AND its k-th distance
       is ≤ the guaranteed-coverage radius min(cell_w, cell_h) — every
       point that close is provably inside the 3×3 neighborhood;
    4. unfinished rows retry one resolution coarser (coverage radius
       doubles, candidate area ×4).  At res 0 the neighborhood spans the
       world and every straggler finishes.

    Dense areas finish in the first rounds (small, cheap candidate sets);
    only sparse-neighborhood rows pay for wide scans — the distributed
    analogue of a per-query expanding ring search.

    **Skew-adaptive start resolution** (r3): a start res derived from the
    GLOBAL average density degenerates on clustered data — on the
    zipf-clustered images table (68 % of rows near one tile) the first
    round's 3×3 candidate join produced ~10⁹ pairs.  Instead each left row
    picks its own start level from the right side's per-cell histogram at
    a fine base res (one aggregate + one broadcast-friendly equi-join):
    with n_local right rows in the row's base cell, a 3×3 neighborhood
    (B−r) levels coarser holds ≈ 9·n_local·4^(B−r) candidates, so the row
    starts at the finest r whose expected candidate count reaches ~4k.
    Dense rows therefore join with SMALL cells (bounded candidates) and
    sparse rows start coarse exactly as before; the per-round completion
    guarantee is untouched (local-uniformity is only a planning estimate —
    under-supplied rows simply coarsen one level and retry).

    Output: (left columns…, {right_id}_right, dist, rank).
    """
    if start_res is None:
        n = n_hint if n_hint is not None else right.count()
        density = max(n, 1) / (360.0 * 180.0)
        # cell width w such that density * (3w)² ≈ 4k candidates
        w = np.sqrt(4.0 * k / max(density, 1e-12)) / 3.0
        start_res = int(np.clip(np.floor(np.log2(360.0 / max(w, 1e-9))), 0, 20))
    res = max(start_res, 2)
    # ---- per-row adaptive start level from the right-cell histogram ------
    base_res = min(res + 6, 20)
    nb = 1 << base_res
    bx = F.least(
        F.greatest(F.floor((F.col(lon) + F.lit(180.0)) / F.lit(360.0 / nb)).cast("long"), F.lit(0)),
        F.lit(nb - 1),
    )
    by = F.least(
        F.greatest(F.floor((F.col(lat) + F.lit(90.0)) / F.lit(180.0 / nb)).cast("long"), F.lit(0)),
        F.lit(nb - 1),
    )
    hist = (
        right.select((bx * F.lit(nb) + by).alias("_bk"))
        .groupBy("_bk")
        .agg(F.count("*").alias("_nloc"))
    )
    lvl_up = F.ceil(
        F.log(4.0, F.lit(4.0 * k) / (F.lit(9.0) * F.coalesce(F.col("_nloc"), F.lit(1))))
    ).cast("int")
    # dense rows (their base cell alone already holds ≥ k right rows) start
    # FINER than the global estimate — bounded candidates; everyone else
    # keeps the global level.  Extrapolating local density from a near-empty
    # cell is unreliable (measured: rows with an empty base cell started 5
    # levels too fine and paid one retry round per level).
    start_lvl = F.when(
        F.coalesce(F.col("_nloc"), F.lit(0)) >= k,
        F.greatest(F.lit(res), F.lit(base_res) - F.greatest(lvl_up, F.lit(0))),
    ).otherwise(F.lit(res))
    leveled = (
        left.withColumn("_bk", bx * F.lit(nb) + by)
        .join(hist, "_bk", "left")
        .withColumn("_startres", start_lvl)
        .drop("_bk", "_nloc")
        .localCheckpoint(eager=True)
    )
    lvl_counts = {
        int(r[0]): int(r[1])
        for r in leveled.groupBy("_startres").count().collect()
    }
    levels = sorted(lvl_counts, reverse=True) or [res]
    res = max(int(levels[0]), 2)
    pending = leveled.filter(F.col("_startres") >= res).drop("_startres")
    n_pending = lvl_counts.get(res, 0)
    done_parts: list[DataFrame] = []
    out_cols = [c for c in left.columns] + [right_id + "_right", "dist", "rank"]
    for _ in range(max_iters):
        if res <= 1:
            # coarse-grid endgame: the ix*n+iy key packing can alias
            # out-of-range neighbors onto valid cells when the grid is
            # ≤2 cells wide (duplicate candidate hazard) — the stragglers
            # left at this point have near-world-scale neighborhoods, so
            # an honest cross join of the (few) pending rows is both
            # correct and the cheapest remaining plan
            r_all = right.select(
                F.col(right_id).alias("_rid"),
                F.col(lon).alias("_rlon"),
                F.col(lat).alias("_rlat"),
            )
            # pending is a deep anti-join/union plan with unknown stats by
            # now — materialize the (small) row set and broadcast it so the
            # cross join streams the right side once instead of a
            # cartesian-shuffle of both sides
            pending = pending.localCheckpoint(eager=True)
            cand = r_all.crossJoin(F.broadcast(pending))
            dx = F.col(lon) - F.col("_rlon")
            dy = F.col(lat) - F.col("_rlat")
            cand = cand.withColumn("_d2", dx * dx + dy * dy)
            w_spec = Window.partitionBy(left_id).orderBy(
                F.col("_d2").asc(), F.col("_rid").asc()
            )
            done_parts.append(
                cand.withColumn("rank", F.row_number().over(w_spec))
                .filter(F.col("rank") <= k)
                .withColumn("dist", F.sqrt(F.col("_d2")))
                .withColumn(right_id + "_right", F.col("_rid"))
                .select(*out_cols)
            )
            break
        n_grid = 1 << res
        cw = 360.0 / n_grid
        ch = 180.0 / n_grid

        def key(lon_c, lat_c):
            ix = F.floor((lon_c + F.lit(180.0)) / F.lit(cw)).cast("long")
            iy = F.floor((lat_c + F.lit(90.0)) / F.lit(ch)).cast("long")
            return (
                F.least(F.greatest(ix, F.lit(0)), F.lit(n_grid - 1)),
                F.least(F.greatest(iy, F.lit(0)), F.lit(n_grid - 1)),
            )

        lx, ly = key(F.col(lon), F.col(lat))
        l_keyed = pending.withColumn("_k", lx * F.lit(n_grid) + ly)
        rx, ry = key(F.col(lon), F.col(lat))
        offsets = F.array(
            *[
                (rx + F.lit(di)) * F.lit(n_grid) + (ry + F.lit(dj))
                for di in (-1, 0, 1)
                for dj in (-1, 0, 1)
            ]
        )
        r_keyed = right.select(
            F.col(right_id).alias("_rid"),
            F.col(lon).alias("_rlon"),
            F.col(lat).alias("_rlat"),
            F.explode(offsets).alias("_k"),
        )
        cand = l_keyed.join(r_keyed, "_k")
        dx = F.col(lon) - F.col("_rlon")
        dy = F.col(lat) - F.col("_rlat")
        cand = cand.withColumn("_d2", dx * dx + dy * dy)
        w_spec = Window.partitionBy(left_id).orderBy(
            F.col("_d2").asc(), F.col("_rid").asc()
        )
        topk = (
            cand.withColumn("rank", F.row_number().over(w_spec))
            .filter(F.col("rank") <= k)
            .withColumn("dist", F.sqrt(F.col("_d2")))
            .withColumn(right_id + "_right", F.col("_rid"))
        )
        # localCheckpoint, not cache(): blocks free themselves when the
        # round frame becomes unreferenced (cache() pins executor storage
        # until an explicit unpersist — r2 leaked one frame per round,
        # ADVICE r2 #3) and the pending anti-join lineage is truncated so
        # the plan doesn't grow by one join per round.
        topk = topk.localCheckpoint(eager=True)
        safe_r = min(cw, ch)
        per_left = topk.groupBy(left_id).agg(
            F.max("dist").alias("_dmax"), F.count("*").alias("_n")
        )
        done_ids = (
            per_left.filter((F.col("_n") >= k) & (F.col("_dmax") <= F.lit(safe_r)))
            .select(left_id)
            .localCheckpoint(eager=True)  # evaluated twice otherwise: the
            # round's pending anti-join AND the caller's final action would
            # each re-run the per-left aggregate
        )
        # semi/anti equi-joins on the id — AQE picks broadcast when the
        # done set is small; no forced broadcast (done_ids can be most
        # of the table on the first round)
        done_parts.append(topk.join(done_ids, left_id, "left_semi").select(*out_cols))
        pending = pending.join(done_ids, left_id, "left_anti")
        # convergence bookkeeping is DRIVER-side arithmetic on the (tiny,
        # already-materialized) done_ids count — no isEmpty re-evaluation
        # of the anti-join chain per round
        n_pending -= done_ids.count()
        # next round: unfinished rows coarsen — straight to the next
        # POPULATED start level when one exists (they merge with that
        # level's first-timers; skipping intermediate levels is sound, the
        # completion guarantee is per-round) else one level at a time; with
        # nothing unfinished and no levels left, done
        lower = [l for l in levels if l < res]
        if n_pending <= 0:
            if not lower:
                break
            res = int(lower[0])
            pending = leveled.filter(F.col("_startres") == res).drop("_startres")
            n_pending = lvl_counts[res]
        else:
            res = int(lower[0]) if lower else res - 1
            pending = pending.unionByName(
                leveled.filter(F.col("_startres") == res).drop("_startres")
            )
            n_pending += lvl_counts.get(res, 0)
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionAll(p)
    return out
