"""Temporal predicates, codecs, affine/CRS transforms."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from jena_geo_spark.functions import codecs as C
from jena_geo_spark.functions import temporal as T
from jena_geo_spark.functions import transform as X
from jena_geo_spark.functions.vector import st_astext, st_geomfromtext


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_allen_relations_complete(spark):
    """Every Allen relation holds for its canonical interval pair and each
    pair satisfies exactly one of the 13 relations."""
    base = ("2024-01-10", "2024-01-20")
    cases = {
        "after": ("2024-01-21", "2024-01-25"),
        "before": ("2024-01-01", "2024-01-05"),
        "meets": ("2024-01-05", "2024-01-10"),  # A.to == B.from
        "met_by": ("2024-01-20", "2024-01-25"),  # A.from == B.to
        "overlaps": ("2024-01-05", "2024-01-15"),
        "overlapped_by": ("2024-01-15", "2024-01-25"),
        "during": ("2024-01-12", "2024-01-18"),
        "contains": ("2024-01-05", "2024-01-25"),
        "starts": ("2024-01-10", "2024-01-15"),
        "started_by": ("2024-01-10", "2024-01-25"),
        "finishes": ("2024-01-15", "2024-01-20"),
        "finished_by": ("2024-01-05", "2024-01-20"),
        "equals": ("2024-01-10", "2024-01-20"),
    }
    rows = [
        (name, _ts(a0), _ts(a1), _ts(base[0]), _ts(base[1]))
        for name, (a0, a1) in cases.items()
    ]
    df = spark.createDataFrame(
        rows, "name string, a0 timestamp, a1 timestamp, b0 timestamp, b1 timestamp"
    )
    sel = [
        T.ALLEN_RELATIONS[rel](F.col("a0"), F.col("a1"), F.col("b0"), F.col("b1")).alias(rel)
        for rel in T.ALLEN_RELATIONS
    ]
    out = {r["name"]: r.asDict() for r in df.select("name", *sel).collect()}
    for name in cases:
        row = out[name]
        assert row[name] is True, f"{name} should hold: {row}"
        true_rels = [rel for rel in T.ALLEN_RELATIONS if row[rel]]
        assert true_rels == [name], f"{name}: got {true_rels}"


def test_t_intersects(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01"), _ts("2024-01-10"), _ts("2024-01-10"), _ts("2024-01-20"))],
        "a0 timestamp, a1 timestamp, b0 timestamp, b1 timestamp",
    )
    r = df.select(
        T.t_intersects(F.col("a0"), F.col("a1"), F.col("b0"), F.col("b1")).alias("i")
    ).first()
    assert r.i


def test_geohash_roundtrip():
    lon, lat = 8.2835, 49.9928
    gh = C.geohash_encode(lon, lat, 12)
    lo2, la2 = C.geohash_decode(gh)
    # 12-char geohash cell ≈ 1.6e-7° lon — centre is within half a cell
    assert abs(lo2 - lon) < 1e-6 and abs(la2 - lat) < 1e-6
    # canonical test vector (Wikipedia): (57.64911, 10.40744) → u4pruydqqvj
    assert C.geohash_encode(10.40744, 57.64911, 11) == "u4pruydqqvj"
    # known prefix sanity (u0... is central Europe)
    assert gh.startswith("u0")


def test_polyline_roundtrip():
    coords = [(-120.2, 38.5), (-120.95, 40.7), (-126.453, 43.252)]
    enc = C.polyline_encode(coords)
    # the reference's AsEncodedPolyline writes raw x,y order, so this is
    # the spec's canonical example with the pair order flipped
    # (AsEncodedPolylineTest.java golden; see polyline_encode docstring)
    assert enc == "~ps|U_p~iFnnqC_ulLvxq`@_mqN"
    dec = C.polyline_decode(enc)
    assert all(abs(a[0] - b[0]) < 1e-5 and abs(a[1] - b[1]) < 1e-5 for a, b in zip(coords, dec))


def test_codecs_spark_udfs(spark):
    df = spark.createDataFrame([(8.2835, 49.9928, 9)], "lon double, lat double, p int")
    r = df.select(
        C.st_geohash(F.col("lon"), F.col("lat"), F.col("p")).alias("gh"),
    ).first()
    assert len(r.gh) == 9
    d = spark.createDataFrame([(r.gh,)], "g string").select(
        C.st_pointfromgeohash(F.col("g")).alias("p")
    ).first()
    assert abs(d.p.lon - 8.2835) < 1e-3 and abs(d.p.lat - 49.9928) < 1e-3


def test_affine_transforms(spark):
    df = spark.createDataFrame([("LINESTRING(1 0, 0 1)",)], "w string").select(
        st_geomfromtext(F.col("w")).alias("g")
    )
    r = df.select(
        st_astext(X.st_scale(F.col("g"), F.lit(2.0), F.lit(3.0))).alias("s"),
        st_astext(X.st_rotate(F.col("g"), F.lit(np.pi / 2))).alias("rot"),
        st_astext(X.st_reflect_x(F.col("g"))).alias("refl"),
        st_astext(X.st_shear(F.col("g"), F.lit(1.0), F.lit(0.0))).alias("sh"),
    ).first()
    assert r.s == "LINESTRING (2 0, 0 3)"
    assert r.refl == "LINESTRING (1 0, 0 -1)"
    assert r.sh == "LINESTRING (1 0, 1 1)"
    # rotate 90° CCW: (1,0)→(0,1), (0,1)→(-1,0)
    g2 = [float(v) for v in r.rot.replace("LINESTRING (", "").replace(")", "").replace(",", " ").split()]
    np.testing.assert_allclose(g2, [0, 1, -1, 0], atol=1e-15)


def test_mercator_known_values():
    # equator/prime-meridian and a canonical checkpoint
    x, y = X.merc_forward(np.array([0.0]), np.array([0.0]))
    assert x[0] == 0.0 and abs(y[0]) < 1e-9
    x, y = X.merc_forward(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(20037508.342789244)
    # roundtrip
    lon = np.array([8.2835, -120.5, 170.0])
    lat = np.array([49.9928, -33.2, 71.5])
    lo2, la2 = X.merc_inverse(*X.merc_forward(lon, lat))
    np.testing.assert_allclose(lo2, lon, atol=1e-12)
    np.testing.assert_allclose(la2, lat, atol=1e-12)


def test_st_transform_udf(spark):
    df = spark.createDataFrame([("POINT (0 0)",)], "w string").select(
        st_geomfromtext(F.col("w")).alias("g")
    )
    r = df.select(
        st_astext(X.st_transform(F.col("g"), F.lit(4326), F.lit(3857))).alias("m")
    ).first()
    assert r.m.startswith("POINT (0 ")


def test_utm_known_value():
    # UTM zone 32N reference point: (lon=9, lat=0) is the central meridian →
    # easting exactly 500000, northing 0
    e, n = X.utm_forward(np.array([9.0]), np.array([0.0]), 32)
    assert e[0] == pytest.approx(500000.0, abs=1e-6)
    assert n[0] == pytest.approx(0.0, abs=1e-6)
    assert X.utm_zone(9.0) == 32
    # southern hemisphere false northing
    e, n = X.utm_forward(np.array([9.0]), np.array([-1.0]), 32)
    assert n[0] > 9_800_000


def test_azimuth(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 1.0), (0.0, 0.0, 1.0, 0.0), (0.0, 0.0, -1.0, 0.0)],
        "x1 double, y1 double, x2 double, y2 double",
    )
    rows = df.select(
        X.st_azimuth(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("az")
    ).collect()
    assert rows[0].az == 0.0  # due north
    assert rows[1].az == pytest.approx(np.pi / 2)  # due east
    assert rows[2].az == pytest.approx(3 * np.pi / 2)  # due west


def test_utm_inverse_roundtrips_forward():
    import numpy as np

    from jena_geo_spark.functions import transform as X

    rng = np.random.default_rng(3)
    # zone 33 spans 12..18°E; sample within ±3° of the central meridian
    lon = 15.0 + rng.uniform(-3, 3, 500)
    lat = rng.uniform(-80, 84, 500)
    for south in (False, True):
        e, n = X.utm_forward(lon, lat, 33, south)
        lon2, lat2 = X.utm_inverse(e, n, 33, south)
        # ~millimetre: 2e-8 deg ~ 2 mm — the truncated Snyder series'
        # intrinsic accuracy at high latitude / zone edge
        assert np.abs(lon2 - lon).max() < 2e-8
        assert np.abs(lat2 - lat).max() < 2e-8


def test_utm_epsg_conventions():
    import numpy as np

    from jena_geo_spark.functions import transform as X

    # central meridian maps to the 500 km false easting; equator to N=0
    e, n = X.utm_forward(np.array([15.0]), np.array([0.0]), 33, False)
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # EPSG 327xx: false northing is a CRS property — applied even north
    # of the equator (unlike the legacy per-point convention)
    e, n = X.utm_forward(np.array([15.0]), np.array([1.0]), 33, True)
    assert n[0] > 10000000.0


def test_st_transform_utm_and_composed_pairs(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from jena_geo_spark.functions import transform as X
    from jena_geo_spark.geom import wkt as W

    wkb = W.to_wkb(W.from_wkt("POINT (15.5 52.1)"))
    df = spark.createDataFrame([(bytearray(wkb),)], "g binary")
    out = df.select(
        X.st_transform(F.col("g"), F.lit(4326), F.lit(32633)).alias("utm"),
        X.st_transform(
            X.st_transform(F.col("g"), F.lit(4326), F.lit(3857)),
            F.lit(3857),
            F.lit(32633),
        ).alias("via_merc"),
    ).collect()[0]
    p_utm = W.from_wkb(bytes(out.utm)).parts[0][0]
    p_via = W.from_wkb(bytes(out.via_merc)).parts[0][0]
    e_ref, n_ref = X.utm_forward(np.array([15.5]), np.array([52.1]), 33, False)
    assert abs(p_utm[0] - e_ref[0]) < 1e-6 and abs(p_utm[1] - n_ref[0]) < 1e-6
    # composed 3857→4326→32633 pivot agrees to micrometres
    assert abs(p_via[0] - e_ref[0]) < 1e-6 and abs(p_via[1] - n_ref[0]) < 1e-6


def test_st_transform_unknown_pair_raises(spark):
    from pyspark.sql import functions as F

    from jena_geo_spark.functions import transform as X

    with pytest.raises(KeyError):
        X._xy_transform(4326, 31370)  # Belgian Lambert 72: not implemented


def test_utm_srids_registered_projected():
    from jena_geo_spark.functions.srid import CRS_REGISTRY, is_geographic

    assert not is_geographic(32601) and not is_geographic(32760)
    assert CRS_REGISTRY[32733]["name"] == "WGS 84 / UTM zone 33S"


def test_conic_laea_origin_invariants_and_roundtrip():
    import numpy as np

    from jena_geo_spark.functions import transform as X

    cases = {
        2154: ((3.0, 46.5), (700000.0, 6600000.0), ((-5, 10), (41, 51))),
        5070: ((-96.0, 23.0), (0.0, 0.0), ((-125, -66), (24, 50))),
        3035: ((10.0, 52.0), (4321000.0, 3210000.0), ((-10, 35), (34, 72))),
    }
    rng = np.random.default_rng(5)
    for srid, (origin, fefn, ((lo1, lo2), (la1, la2))) in cases.items():
        fwd = X._xy_transform(4326, srid)
        inv = X._xy_transform(srid, 4326)
        x, y = fwd(np.array([origin[0]]), np.array([origin[1]]))
        # natural origin maps to the false easting/northing (EPSG def.)
        assert abs(x[0] - fefn[0]) < 1e-6 and abs(y[0] - fefn[1]) < 1e-6, srid
        lon = rng.uniform(lo1, lo2, 500)
        lat = rng.uniform(la1, la2, 500)
        lon2, lat2 = inv(*fwd(lon, lat))
        # LCC/AEA invert iteratively to machine precision; LAEA's authalic
        # series is good to ~1e-8 deg (~1 mm)
        assert np.abs(lon2 - lon).max() < 2e-8, srid
        assert np.abs(lat2 - lat).max() < 2e-8, srid


def test_albers_and_laea_preserve_area():
    """Equal-area projections must map a graticule cell to its authalic
    area: A = Rq^2 * dlam * (sin b2 - sin b1) — an invariant independent
    of the forward/inverse implementation."""
    import numpy as np

    from jena_geo_spark.functions import transform as X

    a, e2, e = X._ell(X._GRS80_A, X._GRS80_F)
    qp = X._q_snyder(np.pi / 2, e2, e)
    rq2 = a * a * qp / 2

    def authalic_area(lon1, lon2, lat1, lat2):
        b1 = np.arcsin(X._q_snyder(np.radians(lat1), e2, e) / qp)
        b2 = np.arcsin(X._q_snyder(np.radians(lat2), e2, e) / qp)
        return rq2 * np.radians(lon2 - lon1) * (np.sin(b2) - np.sin(b1))

    for srid, (lon1, lat1) in ((5070, (-100.0, 40.0)), (3035, (12.0, 48.0))):
        fwd = X._xy_transform(4326, srid)
        lon = np.array([lon1, lon1 + 0.1, lon1 + 0.1, lon1])
        lat = np.array([lat1, lat1, lat1 + 0.1, lat1 + 0.1])
        x, y = fwd(lon, lat)
        shoelace = 0.5 * abs(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        )
        expect = authalic_area(lon1, lon1 + 0.1, lat1, lat1 + 0.1)
        # quad edges are chords, not graticule arcs: agree to ~1e-5 relative
        assert abs(shoelace - expect) / expect < 1e-4, srid


def test_lambert93_is_conformal():
    """Conformal: the local scale factor is direction-independent
    (|dP/d(east)| == |dP/d(north)|) and the images of the east/north unit
    vectors stay orthogonal."""
    import numpy as np

    from jena_geo_spark.functions import transform as X

    fwd = X._xy_transform(4326, 2154)
    lon0, lat0, h = 4.7, 45.2, 1e-7
    x0, y0 = fwd(np.array([lon0]), np.array([lat0]))
    xe, ye = fwd(np.array([lon0 + h]), np.array([lat0]))
    xn, yn = fwd(np.array([lon0]), np.array([lat0 + h]))
    # ellipsoidal metric: a degree of lon spans nu*cos(phi), a degree of
    # lat spans rho_meridional — 0.3% apart on GRS80, so a spherical
    # normalisation would mask/flag conformality spuriously
    a, e2, _ = X._ell(X._GRS80_A, X._GRS80_F)
    s2 = np.sin(np.radians(lat0)) ** 2
    nu = a / np.sqrt(1 - e2 * s2)
    rho_m = a * (1 - e2) / (1 - e2 * s2) ** 1.5
    de = np.array([xe[0] - x0[0], ye[0] - y0[0]]) / (nu * np.cos(np.radians(lat0)))
    dn = np.array([xn[0] - x0[0], yn[0] - y0[0]]) / rho_m
    k_e, k_n = np.hypot(*de), np.hypot(*dn)
    assert abs(k_e - k_n) / k_n < 1e-6
    assert abs(np.dot(de, dn)) / (k_e * k_n) < 1e-6


def test_osgb36_matches_os_worked_example():
    """The Ordnance Survey 'Guide to coordinate systems in Great Britain'
    worked example: OSGB36 geodetic 52°39'27.2531"N 1°43'4.5177"E must map
    to National Grid E 651409.903, N 313177.270 (TM kernel on Airy 1830 —
    an authoritative external golden for the general-TM series)."""
    import numpy as np

    from jena_geo_spark.functions import transform as X

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    tm_fwd, tm_inv = X._tm(
        49.0, -2.0, 0.9996012717, 400000.0, -100000.0, X._AIRY_A, X._AIRY_E2
    )
    e, n = tm_fwd(np.array([lon]), np.array([lat]))
    assert abs(e[0] - 651409.903) < 1e-3
    assert abs(n[0] - 313177.270) < 1e-3
    # natural origin → false easting/northing exactly
    e0, n0 = tm_fwd(np.array([-2.0]), np.array([49.0]))
    assert e0[0] == 400000.0 and n0[0] == -100000.0
    # kernel inverse round-trips to series accuracy
    lon2, lat2 = tm_inv(e, n)
    assert abs(lon2[0] - lon) < 5e-8 and abs(lat2[0] - lat) < 5e-8


def test_osgb36_wgs84_roundtrip_and_helmert():
    """Full 4326↔27700 path incl. the 7-param Helmert datum shift.  The
    +params/−params pair is not an exact inverse (small-angle residual
    ~centimetres) — far inside the single-Helmert approximation's own
    ±3 m vs the OSTN grid."""
    import numpy as np

    from jena_geo_spark.functions import transform as X

    fwd = X._xy_transform(4326, 27700)
    inv = X._xy_transform(27700, 4326)
    rng = np.random.default_rng(9)
    lon = rng.uniform(-7, 1.8, 500)
    lat = rng.uniform(49.9, 60.8, 500)
    lon2, lat2 = inv(*fwd(lon, lat))
    assert np.abs(lon2 - lon).max() < 5e-7  # ~3 cm
    assert np.abs(lat2 - lat).max() < 5e-7
    x, y, z = X._geodetic_to_xyz(np.array([-1.0]), np.array([53.0]), X._WGS_A, X._WGS_E2)
    x2, y2, z2 = X._OSGB36_TO_WGS84(*X._WGS84_TO_OSGB36(x, y, z))
    assert max(abs(x2[0] - x[0]), abs(y2[0] - y[0]), abs(z2[0] - z[0])) < 0.05
