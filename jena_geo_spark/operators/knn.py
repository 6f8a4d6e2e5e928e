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
        # A ring proves completeness only when it yielded ALL k neighbors
        # with the kth inside the inscribed radius; n < k means the ring was
        # too small for a locally sparse region (fewer-than-k-total datasets
        # terminate through the whole_world branch instead).
        ok = whole_world or (
            len(stats) == len(queries)
            and all(r["n"] >= k and r["dmax"] <= safe_r for r in stats)
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


#: bit width of one grid axis inside the packed (res, ix, iy) join key.
#: res <= 20 so valid ix/iy < 2**20; neighbor offsets can push an index to
#: -1 or 2**res, but with 21 bits per axis the borrow/carry lands on an
#: (res', ix', iy') combination no in-range LEFT key ever produces, so
#: out-of-range neighbors simply match nothing (no aliasing, no clamping).
_AXIS_BITS = 21
_AXIS = 1 << _AXIS_BITS


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
    stats: dict | None = None,
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
    picks its own start level from a three-level right-cell histogram
    (base = global+6, mid = global, low = global−4): the finest level whose
    cell holds ≥ k right rows anchors the estimate, and the start is that
    level adjusted by ⌊log₄(9n/4k)⌋ (expected 3×3 candidates ≈ 4k),
    quantized DOWN to an even level.  Dense rows therefore join with SMALL
    cells (bounded candidates even inside the cluster) and desert rows
    start coarse; the per-round completion guarantee is untouched
    (histograms are only planning estimates — under-supplied rows coarsen
    two levels, radius ×4, and retry).

    **Merged multi-level rounds** (r3.1): one level per round serializes
    the driver loop — with per-row starts that meant one ~1.5 s fixed-
    overhead Spark round per populated level.  Instead every pending row
    carries its own ``_res`` and ALL levels join in one round: the join
    key packs (res, ix, iy) into a long, the PENDING side explodes its 3×3
    neighborhood (9·|pending| rows — pending shrinks every round) and the
    right side is keyed once per active level (L·|right|, vs 9·L·|right|
    for a right-side explode).  Done-detection runs inside the same ranked
    frame via window aggregates (count + k-th distance per left id), so a
    round is exactly two actions: one eager localCheckpoint (lineage
    truncation, ADVICE r2 #3's cache-leak fix carried over) and one tiny
    per-level count collect on the materialized blocks.

    Output: (left columns…, {right_id}_right, dist, rank).
    """
    if start_res is None:
        n = n_hint if n_hint is not None else right.count()
        density = max(n, 1) / (360.0 * 180.0)
        # cell width w such that density * (3w)² ≈ 4k candidates
        w = np.sqrt(4.0 * k / max(density, 1e-12)) / 3.0
        start_res = int(np.clip(np.floor(np.log2(360.0 / max(w, 1e-9))), 0, 20))
    res_g = int(np.clip(start_res, 2, 20))
    base_res = min(res_g + 6, 20)
    mid_res = res_g
    low_res = max(res_g - 4, 2)

    def _xy(level, lon_c, lat_c):
        """Clamped (ix, iy) long columns at ``level``."""
        n_grid = 1 << level
        ix = F.floor((lon_c + F.lit(180.0)) / F.lit(360.0 / n_grid)).cast("long")
        iy = F.floor((lat_c + F.lit(90.0)) / F.lit(180.0 / n_grid)).cast("long")
        return (
            F.least(F.greatest(ix, F.lit(0)), F.lit(n_grid - 1)),
            F.least(F.greatest(iy, F.lit(0)), F.lit(n_grid - 1)),
        )

    # ---- three-level right-cell histogram (one scan + two tiny rollups) --
    bx, by = _xy(base_res, F.col(lon), F.col(lat))
    hist_b = right.groupBy(bx.alias("_x"), by.alias("_y")).agg(
        F.count("*").alias("_n")
    )
    d_bm = base_res - mid_res
    d_ml = mid_res - low_res
    hist_m = hist_b.groupBy(
        F.shiftright("_x", d_bm).alias("_x"), F.shiftright("_y", d_bm).alias("_y")
    ).agg(F.sum("_n").alias("_n"))
    hist_l = hist_m.groupBy(
        F.shiftright("_x", d_ml).alias("_x"), F.shiftright("_y", d_ml).alias("_y")
    ).agg(F.sum("_n").alias("_n"))

    def _renamed(h, suffix):
        return h.select(
            F.col("_x").alias("_x" + suffix),
            F.col("_y").alias("_y" + suffix),
            F.col("_n").alias("_n" + suffix),
        )

    # per-row start level: anchor at the finest histogram level whose cell
    # holds >= k right rows, adjust by floor(log4(9n/4k)) so the expected
    # 3x3 candidate count is ~4k, trust-cap the finer excursion at +4
    # levels (within-cell uniformity is an estimate), clamp to [2, 20],
    # quantize down to an even level (halves simultaneous levels AND round
    # count; coarser starts are always safe — just more candidates)
    nb_ = F.coalesce(F.col("_nb"), F.lit(0))
    nm_ = F.coalesce(F.col("_nm"), F.lit(0))
    nl_ = F.coalesce(F.col("_nl"), F.lit(0))
    s_eff = (
        F.when(nb_ >= k, F.lit(base_res))
        .when(nm_ >= k, F.lit(mid_res))
        .otherwise(F.lit(low_res))
    )
    n_eff = (
        F.when(nb_ >= k, nb_).when(nm_ >= k, nm_).otherwise(F.greatest(nl_, F.lit(1)))
    ).cast("double")
    adj = F.floor(F.log(4.0, n_eff * F.lit(9.0 / (4.0 * k))))
    start = F.greatest(
        F.lit(2),
        F.least(s_eff + adj, F.least(s_eff + F.lit(4), F.lit(20))),
    )
    start = (F.floor(start / F.lit(2)) * 2).cast("int")
    leveled = (
        left.withColumn("_xb", bx)
        .withColumn("_yb", by)
        # no broadcast hints: at 100 TB hist_b is as wide as the distinct
        # nonempty right cells — AQE broadcasts when it actually fits
        .join(_renamed(hist_b, "b"), ["_xb", "_yb"], "left")
        .withColumn("_xm", F.shiftright("_xb", d_bm))
        .withColumn("_ym", F.shiftright("_yb", d_bm))
        .join(_renamed(hist_m, "m"), ["_xm", "_ym"], "left")
        .withColumn("_xl", F.shiftright("_xm", d_ml))
        .withColumn("_yl", F.shiftright("_ym", d_ml))
        .join(_renamed(hist_l, "l"), ["_xl", "_yl"], "left")
        .withColumn("_res", start)
        .select(*left.columns, "_res")
        .localCheckpoint(eager=True)
    )
    counts = {
        int(r[0]): int(r[1]) for r in leveled.groupBy("_res").count().collect()
    }
    out_cols = [c for c in left.columns] + [right_id + "_right", "dist", "rank"]
    done_parts: list[DataFrame] = []
    end_parts: list[DataFrame] = []  # stragglers that coarsened below res 2
    n_endgame = 0
    pending = leveled

    def _pack(res_c, ix_c, iy_c):
        return (res_c.cast("long") * _AXIS + ix_c) * _AXIS + iy_c

    rounds = 0
    while counts:
        rounds += 1
        if stats is not None:
            stats["rounds"] = rounds
            stats.setdefault("pending_per_round", []).append(sum(counts.values()))
        if rounds > max_iters:
            raise RuntimeError(
                f"knn_join_frames: {sum(counts.values())} rows unfinished "
                f"after {max_iters} rounds (levels {sorted(counts)})"
            )
        active = sorted(counts)
        # per-row grid geometry from the row's own _res (all even, >= 2)
        ng_l = F.pow(F.lit(2.0), F.col("_res"))
        lx = F.least(
            F.greatest(
                F.floor((F.col(lon) + F.lit(180.0)) * ng_l / F.lit(360.0)).cast("long"),
                F.lit(0),
            ),
            (ng_l - 1).cast("long"),
        )
        ly = F.least(
            F.greatest(
                F.floor((F.col(lat) + F.lit(90.0)) * ng_l / F.lit(180.0)).cast("long"),
                F.lit(0),
            ),
            (ng_l - 1).cast("long"),
        )
        # pending side explodes its 3x3 neighborhood (9·|pending| rows);
        # out-of-range neighbors are intentionally NOT clamped — the packed
        # key makes them match nothing (see _AXIS_BITS note).  The cell
        # coords are MATERIALIZED once (_lx/_ly) before the explode (r6):
        # inlining the floor/clamp chains into all 9 array elements made
        # the expression tree ~9× larger, which showed up as driver-side
        # analysis/codegen time on every round's job, not as task time.
        l_expl = (
            pending.withColumn("_lx", lx)
            .withColumn("_ly", ly)
            .withColumn(
                "_k",
                F.explode(
                    F.array(
                        *[
                            _pack(
                                F.col("_res"),
                                F.col("_lx") + F.lit(di),
                                F.col("_ly") + F.lit(dj),
                            )
                            for di in (-1, 0, 1)
                            for dj in (-1, 0, 1)
                        ]
                    )
                ),
            )
            .drop("_lx", "_ly")
        )
        # right side keyed at its CENTER cell, once per active level
        ng_r = F.pow(F.lit(2.0), F.col("_res"))
        rx = F.least(
            F.greatest(
                F.floor((F.col("_rlon") + F.lit(180.0)) * ng_r / F.lit(360.0)).cast("long"),
                F.lit(0),
            ),
            (ng_r - 1).cast("long"),
        )
        ry = F.least(
            F.greatest(
                F.floor((F.col("_rlat") + F.lit(90.0)) * ng_r / F.lit(180.0)).cast("long"),
                F.lit(0),
            ),
            (ng_r - 1).cast("long"),
        )
        r_keyed = (
            right.select(
                F.col(right_id).alias("_rid"),
                F.col(lon).alias("_rlon"),
                F.col(lat).alias("_rlat"),
                F.explode(F.array(*[F.lit(r) for r in active])).alias("_res"),
            )
            .withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .select(
                "_rid",
                "_rlon",
                "_rlat",
                _pack(F.col("_res"), F.col("_rx"), F.col("_ry")).alias("_k"),
            )
        )
        # small-pending fast path: when the pending key set is broadcast-
        # sized (driver knows the exact pending count), prefilter the right
        # side with a broadcast semi-join — the L·|right| keyed rows never
        # shuffle, they hash-probe a tiny key set and only true candidates
        # survive into the join.  First rounds at 100 TB scale skip this
        # (pending ~ |left|) and take the honest shuffle join.
        if sum(counts.values()) * 9 <= 300_000:
            key_set = l_expl.select("_k").distinct()
            r_keyed = r_keyed.join(F.broadcast(key_set), "_k", "left_semi")
        # LEFT join keeps empty-neighborhood rows pending (null _rid ranks
        # after every real candidate and never enters a done group)
        cand = l_expl.join(r_keyed, "_k", "left")
        dx = F.col(lon) - F.col("_rlon")
        dy = F.col(lat) - F.col("_rlat")
        cand = cand.withColumn("_d2", dx * dx + dy * dy)
        w_rank = Window.partitionBy(left_id).orderBy(
            F.col("_d2").asc_nulls_last(), F.col("_rid").asc_nulls_last()
        )
        w_part = Window.partitionBy(left_id)
        # after the rank<=k filter, count(_rid) == k  <=>  >= k candidates,
        # and max(_d2) is the k-th squared distance — done iff that fits
        # inside the guaranteed-coverage radius min(cw, ch) = 180/2^res
        safe = F.lit(180.0) / F.pow(F.lit(2.0), F.col("_res"))
        scored = (
            cand.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= k)
            .withColumn("_n", F.count("_rid").over(w_part))
            .withColumn("_dk", F.max("_d2").over(w_part))
            .withColumn(
                "_done",
                F.coalesce(
                    (F.col("_n") >= k) & (F.col("_dk") <= safe * safe), F.lit(False)
                ),
            )
            # _bound (r6): when the row already HAS k candidates, its
            # current k-th distance upper-bounds the true k-th — the
            # endgame cross join filters on it map-side, so the per-left
            # window never sees the full |pending|×|right| pair set
            .withColumn(
                "_bound", F.when(F.col("_n") >= k, F.col("_dk"))
            )
            .select(*left.columns, "_res", "_rid", "_d2", "rank", "_done", "_bound")
        )
        # one eager localCheckpoint per round: truncates lineage AND lets
        # the done/pending splits + the count below reuse the same blocks
        # (cache() would pin storage for the session — ADVICE r2 #3)
        scored = scored.localCheckpoint(eager=True)
        done_parts.append(
            scored.filter("_done")
            .withColumn("dist", F.sqrt(F.col("_d2")))
            .withColumn(right_id + "_right", F.col("_rid"))
            .select(*out_cols)
        )
        nxt = scored.filter((~F.col("_done")) & (F.col("rank") == 1)).select(
            *left.columns, (F.col("_res") - 2).alias("_res"), "_bound"
        )
        # per-level pending counts: a tiny aggregate over materialized
        # blocks — the round's ONLY other action
        new_counts: dict[int, int] = {}
        for r in (
            scored.filter((~F.col("_done")) & (F.col("rank") == 1))
            .groupBy("_res")
            .count()
            .collect()
        ):
            new_counts[int(r[0]) - 2] = int(r[1])
        # r6 tail pivot: every grid round costs one full fixed-latency job
        # (right scan + keying + join + window + checkpoint) no matter how
        # few rows are still pending.  When the remaining work is small —
        # |pending| × |right| candidate pairs under a knob — the exact
        # endgame cross join (one streamed pass over the right side, same
        # (dist², id) top-k and tie-break, provably identical output)
        # finishes the tail in ONE bounded job instead of 1-3 more rounds.
        # At real scale |right| keeps the product over the knob until the
        # tail truly is tiny, so grid rounds still do the heavy lifting.
        from ..config import knob

        pend_total = sum(new_counts.values())
        if (
            pend_total
            and n_hint is not None
            and pend_total * n_hint <= knob("KNN_TAIL_CROSS_ROWS")
        ):
            end_parts.append(nxt.drop("_res"))
            n_endgame += pend_total
            counts = {}
            continue
        n_end = sum(c for lvl, c in new_counts.items() if lvl < 2)
        if n_end:
            end_parts.append(nxt.filter(F.col("_res") < 2).drop("_res"))
            n_endgame += n_end
        pending = nxt.filter(F.col("_res") >= 2)
        counts = {lvl: c for lvl, c in new_counts.items() if lvl >= 2}
    if stats is not None:
        stats["endgame_rows"] = n_endgame
    if n_endgame:
        # coarse endgame: the stragglers have near-world-scale
        # neighborhoods, so an honest cross join of the (few, materialized
        # + broadcast) pending rows streams the right side exactly once
        pend = end_parts[0]
        for p in end_parts[1:]:
            pend = pend.unionByName(p)
        pend = pend.localCheckpoint(eager=True)
        r_all = right.select(
            F.col(right_id).alias("_rid"),
            F.col(lon).alias("_rlon"),
            F.col(lat).alias("_rlat"),
        )
        from ..config import knob

        if pend.count() <= knob("KNN_ENDGAME_BROADCAST_ROWS"):
            cand = r_all.crossJoin(F.broadcast(pend))
        else:
            # a LARGE pending set only survives to the endgame when the
            # right side is smaller than k (no left row can ever collect
            # k neighbors) — broadcasting the pending side would then
            # broadcast the whole left table.  Broadcast the provably
            # tiny right side instead and stream the pending rows.
            cand = pend.crossJoin(F.broadcast(r_all.localCheckpoint(eager=True)))
        dx = F.col(lon) - F.col("_rlon")
        dy = F.col(lat) - F.col("_rlat")
        cand = cand.withColumn("_d2", dx * dx + dy * dy)
        # map-side prune on the carried k-th-distance bound (exact: every
        # true top-k row has _d2 ≤ the row's current k-th distance, ties
        # included via <=; rows that never collected k candidates have a
        # NULL bound and stay unpruned).  Without this the per-left
        # window would exchange the FULL |pending|×|right| pair set into
        # |pending| keys (measured 15 s for 147×200k at sf0.1; 0.9 s
        # with the prune).
        cand = cand.filter(
            F.col("_bound").isNull() | (F.col("_d2") <= F.col("_bound"))
        )
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
    if not done_parts:
        # left was empty: a zero-row frame with the right output schema
        rid_type = right.schema[right.columns.index(right_id)].dataType
        done_parts.append(
            leveled.drop("_res")
            .withColumn(right_id + "_right", F.lit(None).cast(rid_type))
            .withColumn("dist", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(None).cast("int"))
            .select(*out_cols)
        )
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionAll(p)
    return out
