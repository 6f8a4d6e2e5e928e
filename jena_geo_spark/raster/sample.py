"""Raster point-sampling join — value-at-point over a raster-tile TABLE.

Reference parity: ``rast_value``-style accessors (``raster/attribute``)
answer "this raster, this point"; at coverage scale the question is a
JOIN — for every point row, the pixel value of every tile whose extent
contains it.  Plan shape:

1. tile side: one ``mapInPandas`` decodes each tile's georeference and
   emits (cell, tile_id, rast) for the few grid cells its extent overlaps
   at ``cover_res`` (choose ``cover_res`` so a tile spans ≤ 2×2 cells —
   the blob is replicated per overlapping cell, so the fan-out is ≤ 4);
2. point side: ONE int64 cell key from floor arithmetic — whole-stage
   codegen, no UDF;
3. equi-join on the cell key (broadcastable when the tile side is small,
   AQE-skew-splittable otherwise), then a single ``mapInPandas`` refine:
   payloads factorize so each distinct tile decodes once per batch, and
   sampling is one vectorised gather per (batch, tile) group.

Pixel assignment is floor-based on the tile extent (pixel (0,0) owns
[x0, x0+scale) where x0 = ip_x − scale/2): an exact partition of the
extent, mirrored term-for-term by the SQL oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import wkb_raster as WR

_LON_MIN, _LAT_MIN = -180.0, -90.0
_LON_SPAN, _LAT_SPAN = 360.0, 180.0


def sample_raster_at_points(
    tiles: DataFrame,
    points: DataFrame,
    cover_res: int,
    tile_id: str = "tile_id",
    raster_col: str = "rast",
    lon: str = "lon",
    lat: str = "lat",
    band: int = 0,
) -> DataFrame:
    """For every (point, tile) pair where the point lies inside the tile's
    georeferenced extent: the pixel value under the point.

    Output: points.columns + [tile_id, value].  Overlapping tiles emit one
    row each; points outside every tile emit nothing."""
    n = 1 << cover_res
    cw = _LON_SPAN / n
    ch = _LAT_SPAN / n

    cover_schema = f"cell long, {tile_id} string, _rast binary"

    def tile_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cells, ids, blobs = [], [], []
            for tid, blob in zip(pdf[tile_id], pdf[raster_col]):
                if blob is None:
                    continue
                r = WR.decode(bytes(blob))
                x0 = r.ip_x - 0.5 * r.scale_x
                y0 = r.ip_y - 0.5 * r.scale_y
                x1 = x0 + r.width * r.scale_x
                y1 = y0 + r.height * r.scale_y
                x0, x1 = min(x0, x1), max(x0, x1)
                y0, y1 = min(y0, y1), max(y0, y1)
                ix0 = int(np.clip((x0 - _LON_MIN) // cw, 0, n - 1))
                ix1 = int(np.clip((x1 - _LON_MIN) // cw, 0, n - 1))
                iy0 = int(np.clip((y0 - _LAT_MIN) // ch, 0, n - 1))
                iy1 = int(np.clip((y1 - _LAT_MIN) // ch, 0, n - 1))
                for ix in range(ix0, ix1 + 1):
                    for iy in range(iy0, iy1 + 1):
                        cells.append(ix * n + iy)
                        ids.append(tid)
                        blobs.append(bytes(blob))
            yield pd.DataFrame(
                {"cell": np.array(cells, dtype=np.int64), tile_id: ids, "_rast": blobs}
            )

    t_keyed = tiles.select(tile_id, raster_col).mapInPandas(tile_cells, cover_schema)

    ix = F.floor((F.col(lon) - F.lit(_LON_MIN)) / F.lit(cw)).cast("long")
    iy = F.floor((F.col(lat) - F.lit(_LAT_MIN)) / F.lit(ch)).cast("long")
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    p_keyed = points.withColumn("cell", ix * F.lit(n) + iy)

    cand = p_keyed.join(t_keyed, "cell")

    pt_cols = list(points.columns)  # plain list: the closure must not
    # capture the DataFrame (it drags the SparkContext into the pickle)
    out_cols = pt_cols + [tile_id, "value"]
    schema_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in points.schema.fields
    )
    out_schema = f"{schema_fields}, {tile_id} string, value double"

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniq = pd.factorize(pdf["_rast"])
            px = pdf[lon].to_numpy(dtype=np.float64)
            py = pdf[lat].to_numpy(dtype=np.float64)
            vals = np.full(len(pdf), np.nan)
            keep = np.zeros(len(pdf), dtype=bool)
            for u, blob in enumerate(uniq):
                m = codes == u
                r = WR.decode(bytes(blob))
                x0 = r.ip_x - 0.5 * r.scale_x
                y0 = r.ip_y - 0.5 * r.scale_y
                col = np.floor((px[m] - x0) / r.scale_x)
                row = np.floor((py[m] - y0) / r.scale_y)
                ok = (col >= 0) & (col < r.width) & (row >= 0) & (row < r.height)
                data = r.bands[band].data.astype(np.float64)
                ci = np.clip(col, 0, r.width - 1).astype(np.int64)
                ri = np.clip(row, 0, r.height - 1).astype(np.int64)
                v = data[ri, ci]
                v[~ok] = np.nan
                vals[m] = v
                keep[m] = ok
            out = pdf.loc[keep, pt_cols + [tile_id]].copy()
            out["value"] = vals[keep]
            yield out

    return cand.mapInPandas(refine, out_schema).select(*out_cols)
