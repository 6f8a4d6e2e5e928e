"""Surface-parity gate: every reference registration name
(PostGISConfig.java:372-815, 423 unique) must be wired in
functions/registry.py AND execute against the sample frame.

Executed in batches (one Spark job per ~40 functions) so the whole
423-name sweep stays fast."""

import pytest

from jena_geo_spark.functions import registry as REG
from jena_geo_spark.functions._ref_registry_names import REF_NAMES

# the geof:sf* core predicates + st_rast_algebra_abs are intentional BONUS
# surface beyond PostGISConfig (jena-geosparql registers the sf* family in
# its own core config)
ALLOWED_EXTRAS = {
    "st_coveredby",
    "st_covers",
    "st_crosses",
    "st_disjoint",
    "st_intersection",
    "st_intersects",
    "st_overlaps",
    "st_touches",
    "st_within",
    "st_rast_algebra_abs",
    # geof:distance — GeoSPARQL core function with the reference's
    # SRID-keyed great-circle/planar dispatch (GeometryWrapper.java:676)
    "geof_distance",
    # CoverageJSON literal codec — reference ships the classes but never
    # registers them in PostGISConfig
    "st_ascoveragejson",
    "st_rastfromcoveragejson",
    # XYZ / ASCIIGrid / GeoTIFF-read raster literals — the reference's
    # "Planned further implementations" list (README.md:412-421)
    "st_asxyz",
    "st_rastfromxyz",
    "st_asasciigrid",
    "st_rastfromasciigrid",
    "st_rastfromtiff",
    # NetCDF classic codec — the last format on that planned list
    "st_asnetcdf",
    "st_rastfromnetcdf",
}


def test_full_name_parity():
    assert REG.missing_names() == [], f"unwired reference names: {REG.missing_names()}"
    assert set(REG.extra_names()) <= ALLOWED_EXTRAS


def _batches(n=40):
    names = sorted(REG.REGISTRY)
    return [names[i : i + n] for i in range(0, len(names), n)]


@pytest.fixture(scope="module")
def frame(spark):
    return REG.sample_frame(spark).cache()


@pytest.mark.parametrize("batch", _batches(), ids=lambda b: b[0])
def test_registry_entries_execute(frame, batch):
    cols = []
    for name in batch:
        cols.append(REG.invoke(name, frame).alias(name))
    row = frame.select(*cols).collect()[0]
    # every entry must produce a value on the sample inputs — since r3
    # there are no codec stubs left (tiff and jpg are real encoders)
    nullable: set[str] = set()
    for name in batch:
        if name in nullable:
            continue
        assert row[name] is not None, f"{name} returned NULL on sample input"


@pytest.fixture(scope="module")
def mixed_null_frame(spark, frame):
    from pyspark.sql import functions as F

    nulls = frame.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in frame.schema.fields]
    )
    return frame.unionByName(nulls).cache()


@pytest.mark.parametrize("batch", _batches(), ids=lambda b: b[0])
def test_registry_entries_null_safe(mixed_null_frame, batch):
    """SQL NULL propagation: every registered function must execute over a
    batch containing an all-NULL row without crashing the task (the
    reference host surfaces unbound args as unbound results — the
    relational NULL).  Geometry/scalar UDFs return NULL on the null row;
    struct UDFs (st_bounds, st_centroid, ...) return their documented
    NaN-row convention; literal-only constructors may return values."""
    import math

    from pyspark.sql import Row

    cols = [REG.invoke(name, mixed_null_frame).alias(name) for name in batch]
    rows = mixed_null_frame.select(*cols).collect()
    assert len(rows) == 2
    for name in batch:  # the valid row must still produce a value
        assert rows[0][name] is not None, f"{name} NULL on sample input"
    for name in batch:
        # the NULL row must not fabricate live-looking scalars: allow NULL,
        # NaN-row structs, False (NaN-envelope bbox predicates), empty
        # collections, and literal-only constructors (args carry no column)
        fn, args = REG.REGISTRY[name.lower()]
        if not any(isinstance(a, str) for a in args):
            continue  # literal-only: no NULL input reaches it
        v = rows[1][name]
        ok = (
            v is None
            or v is False
            or isinstance(v, Row)
            or (isinstance(v, float) and math.isnan(v))
            or (isinstance(v, (list, bytearray, bytes, str)) and len(v) == 0)
        )
        assert ok, f"{name} returned {v!r} for NULL input"


@pytest.fixture(scope="module")
def empty_geom_frame(spark, frame):
    """Sample frame with every geometry column replaced by the matching
    EMPTY geometry (raster/string/numeric columns untouched)."""
    from jena_geo_spark.geom import wkt as W

    empties = {
        "point": "POINT EMPTY",
        "linestring": "LINESTRING EMPTY",
        "polygon": "POLYGON EMPTY",
        "multipoint": "MULTIPOINT EMPTY",
        "multilinestring": "MULTILINESTRING EMPTY",
        "multipolygon": "MULTIPOLYGON EMPTY",
        "geometrycollection": "GEOMETRYCOLLECTION EMPTY",
    }
    pdf = frame.toPandas()
    for col in pdf.columns:
        v = pdf[col].iloc[0]
        if isinstance(v, (bytes, bytearray)):
            try:
                kind = W.from_wkb(bytes(v)).kind
            except Exception:
                continue  # raster / non-geometry binary
            if kind in empties:
                pdf[col] = [bytearray(W.to_wkb(W.from_wkt(empties[kind])))]
    return spark.createDataFrame(pdf, schema=frame.schema).cache()


@pytest.mark.parametrize("batch", _batches(), ids=lambda b: b[0])
def test_registry_entries_empty_safe(empty_geom_frame, batch):
    """EMPTY-geometry totality: every registered function must execute over
    EMPTY geometry operands without crashing the task.  Operators with no
    defined result on an empty operand (distances, interpolation, editors)
    return NULL — the reference host throws ExprEvalException per row,
    which SPARQL turns into an unbound (= NULL) result; relate-family
    matrices follow JTS ('FFFFFF212'-style)."""
    cols = [REG.invoke(name, empty_geom_frame).alias(name) for name in batch]
    rows = empty_geom_frame.select(*cols).collect()
    assert len(rows) == 1
