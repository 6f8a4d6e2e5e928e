"""Raster transforms/editors/stats: resize, rescale, nodata, summary
stats, value lookup, PNG export."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.raster import transform as RT
from jena_geo_spark.raster import wkb_raster as WR


def _mk(w=8, h=4, vals=None, nodata=None, pixtype=11):
    data = (
        np.arange(w * h, dtype=np.float64).reshape(h, w)
        if vals is None
        else np.asarray(vals, dtype=np.float64)
    )
    dt, _ = WR.PIXEL_DTYPES[pixtype]
    band = WR.Band(pixtype, nodata, data.astype(dt), nodata or 0)
    return WR.Raster(0, 2.0, -2.0, 100.0, 50.0, 0.0, 0.0, 4326, w, h, [band])


def test_resize_nearest_and_extent():
    r = _mk(8, 4)
    out = RT.resize(r, 4, 2)
    assert out.width == 4 and out.height == 2
    assert out.scale_x == 4.0 and out.scale_y == -4.0
    # nearest-neighbor picks source pixels (0,0),(0,2)... row 0: 0,2,4,6
    assert out.bands[0].data[0].tolist() == [0.0, 2.0, 4.0, 6.0]
    # extent preserved
    assert r.envelope() == out.envelope()


def test_rescale_pixel_size():
    r = _mk(8, 4)
    out = RT.rescale(r, 4.0, 4.0)
    assert (out.width, out.height) == (4, 2)
    assert out.scale_x == 4.0 and out.scale_y == -4.0


def test_summary_stats_and_nodata():
    vals = np.array([[1, 2], [3, -9]], dtype=np.float64)
    r = _mk(2, 2, vals, nodata=-9.0)
    s = RT.summary_stats(r)
    assert s["count"] == 3 and s["sum"] == 6.0 and s["mean"] == 2.0
    assert s["min"] == 1.0 and s["max"] == 3.0
    r2 = RT.set_band_nodata(r, 0, 1.0)
    s2 = RT.summary_stats(r2)
    assert s2["count"] == 3 and s2["min"] == -9.0


def test_value_and_nearest_value():
    vals = np.array([[1, -9], [3, 4]], dtype=np.float64)
    r = _mk(2, 2, vals, nodata=-9.0)
    # world coords: ip(100,50), scale (2,-2): pixel (0,0) covers x∈[100,102)
    assert RT.value_at(r, 101.0, 49.0) == 1.0
    assert RT.value_at(r, 103.0, 49.0) is None  # nodata
    assert RT.nearest_value(r, 103.0, 49.0) in (1.0, 4.0)
    assert RT.value_at(r, 999.0, 49.0) is None  # out of grid


def test_add_band_and_png():
    r = _mk(4, 4)
    r2 = RT.add_band(r, np.ones((4, 4)), pixtype=11)
    assert len(r2.bands) == 2
    png = RT.as_png(r)
    from jena_geo_spark.image.codec import decode_png

    img = decode_png(png)
    assert img.shape == (4, 4, 3)
    assert img[0, 0, 0] == 0 and img[3, 3, 0] == 255  # min→0, max→255


def test_raster_transform_udfs(spark):
    r = _mk(8, 4)
    df = spark.createDataFrame([(bytearray(WR.encode(r)),)], "rast binary")
    row = df.select(
        RT.st_summarystats("rast").alias("s"),
        RT.st_resize("rast", F.lit(4), F.lit(2)).alias("rz"),
        RT.st_value("rast", F.lit(101.0), F.lit(49.0)).alias("v"),
        RT.st_aspng("rast").alias("png"),
    ).first()
    assert row["s"]["count"] == 32 and row["s"]["max"] == 31.0
    rz = WR.decode(bytes(row["rz"]))
    assert rz.width == 4 and rz.height == 2
    assert row["v"] == 0.0
    assert bytes(row["png"])[:4] == b"\x89PNG"


def test_tiff_bottom_up_raster_georeference_equivalent():
    """A bottom-up raster (scale_y > 0) must encode with flipped rows and a
    top-edge tiepoint so world-coordinate sampling is preserved."""
    import numpy as np

    from jena_geo_spark.raster.tiff import encode_tiff, tiff_to_raster
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    r = Raster(0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 4326, 2, 3, [])
    r.bands.append(Band(11, None, np.arange(6, dtype=np.float64).reshape(3, 2)))
    out = tiff_to_raster(encode_tiff(r))
    assert out.scale_y < 0  # normalised to top-down
    # same value at the same WORLD coordinate: original row j sits at
    # world y = ip_y + j*scale_y; sample the decoded raster there
    for j in range(3):
        for i in range(2):
            wx = r.ip_x + (i + 0.5) * r.scale_x  # pixel centers
            wy = r.ip_y + (j + 0.5) * r.scale_y
            col, row = out.world_to_raster(wx, wy)
            assert out.bands[0].data[row, col] == r.bands[0].data[j, i]


def test_xyz_rejects_nonuniform_spacing():
    import pytest as _pytest

    from jena_geo_spark.raster.grids import xyz_to_raster

    pts = [(x, y, 1.0) for x in (0.0, 1.0, 3.0) for y in (0.0, 1.0, 2.0)]
    s = "\n".join(f"{x} {y} {z}" for x, y, z in pts)
    with _pytest.raises(ValueError, match="non-uniform"):
        xyz_to_raster(s)


def test_covjson_band_order_ten_plus_bands():
    import numpy as np

    from jena_geo_spark.raster.covjson import covjson_to_raster, raster_to_covjson
    from jena_geo_spark.raster.wkb_raster import Band, Raster

    r = Raster(0, 1.0, -1.0, 0.0, 2.0, 0.0, 0.0, 4326, 2, 2, [])
    for i in range(12):
        r.bands.append(Band(11, None, np.full((2, 2), float(i))))
    out = covjson_to_raster(raster_to_covjson(r))
    assert [b.data[0, 0] for b in out.bands] == [float(i) for i in range(12)]


def test_fused_algebra_stats_matches_per_tile(spark):
    """fused_algebra_stats_udf: the homogeneous-batch matrix fast path
    and the per-tile fallback must both equal the unfused reference
    chain (map_algebra2 -> map_algebra_const -> summary_stats) exactly."""
    import numpy as np
    import pandas as pd

    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import transform as RT
    from jena_geo_spark.raster import wkb_raster as WR

    def mk(seed, w=6, h=4):
        v = (np.arange(w * h, dtype=np.int64) * 37 + seed * 101) % 251
        return WR.Raster(
            0, 1.0, -1.0, float(seed), 0.0, 0.0, 0.0, 4326, w, h,
            [WR.Band(7, None, v.reshape(h, w).astype(np.int32), 0)],
        )

    def expected(ra, rb):
        rc = RA.map_algebra_const(RA.map_algebra2(ra, rb, "add"), "multiply", 3.0)
        return RT.summary_stats(rc)

    fused = RT.fused_algebra_stats_udf([("add", None), ("multiply_const", 3.0)])

    for shapes in [[(6, 4)] * 5, [(6, 4), (6, 4), (8, 3), (6, 4), (8, 3)]]:
        ras = [mk(i, w, h) for i, (w, h) in enumerate(shapes)]
        rbs = [mk(i + 50, w, h) for i, (w, h) in enumerate(shapes)]
        rows = [(i, WR.encode(ras[i]), WR.encode(rbs[i])) for i in range(len(ras))]
        df = spark.createDataFrame(rows, "i long, ra binary, rb binary")
        got = {
            r.i: r.s.asDict()
            for r in df.select("i", fused("ra", "rb").alias("s")).collect()
        }
        for i in range(len(ras)):
            exp = expected(ras[i], rbs[i])
            for k, v in exp.items():
                assert got[i][k] == v, (shapes[0] == shapes[-1], i, k, got[i][k], v)


def test_fused_algebra_stats_null_tiles(spark):
    """A NULL raster on either side yields a NULL stats row (null_safe,
    same contract as st_summarystats) instead of failing the batch; the
    non-NULL rows still match the unfused reference chain exactly."""
    import numpy as np

    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import transform as RT
    from jena_geo_spark.raster import wkb_raster as WR

    def mk(seed, w=6, h=4):
        v = (np.arange(w * h, dtype=np.int64) * 37 + seed * 101) % 251
        return WR.Raster(
            0, 1.0, -1.0, float(seed), 0.0, 0.0, 0.0, 4326, w, h,
            [WR.Band(7, None, v.reshape(h, w).astype(np.int32), 0)],
        )

    ras = [mk(i) for i in range(4)]
    rbs = [mk(i + 50) for i in range(4)]
    rows = [
        (0, WR.encode(ras[0]), WR.encode(rbs[0])),
        (1, None, WR.encode(rbs[1])),  # NULL left
        (2, WR.encode(ras[2]), None),  # NULL right
        (3, WR.encode(ras[3]), WR.encode(rbs[3])),
    ]
    df = spark.createDataFrame(rows, "i long, ra binary, rb binary").repartition(1)
    fused = RT.fused_algebra_stats_udf([("add", None), ("multiply_const", 3.0)])
    got = {r.i: r.s for r in df.select("i", fused("ra", "rb").alias("s")).collect()}
    for i in (1, 2):
        s = got[i]
        assert s is None or all(
            v is None or (isinstance(v, float) and v != v) for v in s.asDict().values()
        ), (i, s)
    for i in (0, 3):
        exp = RT.summary_stats(
            RA.map_algebra_const(RA.map_algebra2(ras[i], rbs[i], "add"), "multiply", 3.0)
        )
        for k, v in exp.items():
            assert got[i].asDict()[k] == v, (i, k)


def test_stage_udf_batch_fast_path_bit_exact(spark):
    """rast2_udf / rastconst_udf homogeneous-batch vectorization must be
    BYTE-exact with the per-tile path (template-splice encode), and fall
    back untouched on heterogeneous/None batches."""
    import numpy as np

    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import wkb_raster as WR

    rng = np.random.default_rng(3)

    def tile(w, h, ip):
        r = WR.Raster(0, 1.0, -1.0, float(ip), float(-ip), 0.0, 0.0, 4326, w, h)
        r.bands.append(WR.Band(5, None, rng.integers(-40, 90, (h, w)).astype(np.int16)))
        return WR.encode(r)

    homo = [(i, tile(6, 4, i), tile(6, 4, 100 + i)) for i in range(40)]
    hetero = homo[:3] + [(90, tile(3, 3, 9), tile(3, 3, 10)), (91, None, tile(6, 4, 1))]

    for rows in (homo, hetero):
        df = spark.createDataFrame(rows, "id long, ra binary, rb binary")
        got = {
            r.id: (bytes(r.o2) if r.o2 is not None else None,
                   bytes(r.oc) if r.oc is not None else None)
            for r in df.select(
                "id",
                RS.rast2_udf("add")(F.col("ra"), F.col("rb")).alias("o2"),
                RS.rastconst_udf("divide")(F.col("ra"), F.lit(-1), (F.col("id") % 5).cast("double")).alias("oc"),
            ).collect()
        }
        for i, a, b in rows:
            if a is None or b is None:
                # rast2 yields NULL on any NULL input; rastconst only
                # depends on ra
                expc = (
                    None
                    if a is None
                    else WR.encode(
                        RA.map_algebra_const(WR.decode(bytes(a)), "divide", float(i % 5), -1)
                    )
                )
                assert got[i] == (None, expc)
                continue
            exp2 = WR.encode(RA.map_algebra2(WR.decode(bytes(a)), WR.decode(bytes(b)), "add"))
            expc = WR.encode(RA.map_algebra_const(WR.decode(bytes(a)), "divide", float(i % 5), -1))
            assert got[i] == (exp2, expc), f"mismatch at id {i}"


def test_summarystats_batch_fast_path_value_exact(spark):
    """Matrix-stats fast path must equal the per-tile summary_stats
    values exactly (same numpy reductions, same float64 inputs)."""
    import numpy as np

    from jena_geo_spark.raster import wkb_raster as WR
    from jena_geo_spark.raster.transform import st_summarystats, summary_stats

    rng = np.random.default_rng(11)

    def tile(w, h, i):
        r = WR.Raster(0, 1.0, -1.0, float(i), 0.0, 0.0, 0.0, 4326, w, h)
        r.bands.append(WR.Band(10, None, rng.normal(size=(h, w)).astype(np.float32)))
        return WR.encode(r)

    rows = [(i, tile(7, 5, i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, r binary")
    got = {r.id: r.s.asDict() for r in df.select("id", st_summarystats(F.col("r")).alias("s")).collect()}
    for i, t in rows:
        exp = summary_stats(WR.decode(bytes(t)))
        g = got[i]
        assert g["count"] == exp["count"]
        for k in ("sum", "mean", "stddev", "min", "max"):
            assert g[k] == exp[k], (i, k, g[k], exp[k])


def test_summarystats_all_null_batch_yields_null_structs(spark):
    from jena_geo_spark.raster.transform import st_summarystats

    df = spark.createDataFrame([(0, None), (1, None)], "id long, r binary")
    rows = {r.id: r.s for r in df.select("id", st_summarystats(F.col("r")).alias("s")).collect()}
    # null_safe struct convention: masked rows become all-NULL-field rows
    # (previously this batch failed the task with a 0-column frame)
    for i in (0, 1):
        assert rows[i].sum is None and rows[i].mean is None


def test_stage_and_stats_big_endian_fallback_correct(spark):
    """Big-endian tiles must NOT take the splice path (header corruption
    hazard) but must still produce per-tile-correct results; the
    matrix-only stats path may vectorize them."""
    import numpy as np

    from jena_geo_spark.functions import registry_support as RS
    from jena_geo_spark.raster import algebra as RA
    from jena_geo_spark.raster import wkb_raster as WR
    from jena_geo_spark.raster.transform import st_summarystats, summary_stats

    rng = np.random.default_rng(53)

    def tile_be(i):
        r = WR.Raster(0, 1.0, -1.0, float(i), 0.0, 0.0, 0.0, 4326, 4, 3)
        r.bands.append(WR.Band(5, None, rng.integers(0, 50, (3, 4)).astype(np.int16)))
        return WR.encode(r, little=False)

    rows = [(i, tile_be(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, r binary")
    got_abs = {r.id: bytes(r.o) for r in df.select("id", RS.rast1_udf("abs")(F.col("r")).alias("o")).collect()}
    got_stats = {r.id: r.s.asDict() for r in df.select("id", st_summarystats(F.col("r")).alias("s")).collect()}
    for i, t in rows:
        assert got_abs[i] == WR.encode(RA.map_algebra1(WR.decode(bytes(t)), "abs"))
        exp = summary_stats(WR.decode(bytes(t)))
        assert got_stats[i]["sum"] == exp["sum"] and got_stats[i]["count"] == exp["count"]
