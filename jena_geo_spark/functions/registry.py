"""1:1 registry of the reference's scalar-function surface.

``REGISTRY`` maps every registration name from ``PostGISConfig.java:372-815``
(423 unique names, vendored as ``_ref_registry_names.REF_NAMES``) to a
Column-level callable plus a smoke argspec.  ``tests/test_registry.py``
asserts full-name parity and *executes* every entry against a standard
sample frame, so each registered name is a tested code path, not an alias
on paper.

Argspec tokens name columns of the sample frame built by
``sample_frame(spark)``; tuples ``("lit", v)`` become ``F.lit(v)``, and
``("pylit", v)`` are passed as raw Python values (for callables that take
plain-Python configuration rather than Columns).

Where the reference registers a class that merely throws
``UnsupportedOperationException`` (≈30 of the 423 — e.g. Tesselate,
ClusterKMeans, AsTopoJSON, ForceLHR, LocateBetween) we implement the
PostGIS/JTS-documented semantics instead; the implementing module's
docstring carries the citation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..raster import attributes as RT
from ..raster import transform as RTR
from . import accessors as A
from . import aggregates as AG  # noqa: F401 (aggregate surface, §2.4)
from . import codecs as C
from . import exporters as E
from . import exporters2 as E2
from . import registry_support as RS
from . import relate as R
from . import relations2 as R2
from . import shapes as SH
from . import srid as SR
from . import temporal as T  # noqa: F401
from . import transform as TR
from . import transforms2 as T2
from . import vector as V
from . import zm as Z
from ._ref_registry_names import REF_NAMES

REGISTRY: dict[str, tuple] = {}


def _reg(name: str, fn, *args) -> None:
    REGISTRY[name.lower()] = (fn, args)


L = lambda v: ("lit", v)  # noqa: E731

# ------------------------------------------------------------------- units --

_UNITS = {
    "USFootToMeter": ("usfoot", "m"),
    "USInchToMeter": ("usinch", "m"),
    "USMileToMeter": ("usmile", "m"),
    "USYardToMeter": ("usyard", "m"),
    "centimeterToMeter": ("cm", "m"),
    "chainToMeter": ("chain", "m"),
    "decimeterToMeter": ("dm", "m"),
    "fathomToMeter": ("fathom", "m"),
    "footToMeter": ("foot", "m"),
    "inchToMeter": ("inch", "m"),
    "kilometerToMeter": ("km", "m"),
    "linkToMeter": ("link", "m"),
    "meterToCentimeter": ("m", "cm"),
    "meterToChain": ("m", "chain"),
    "meterToDecimeter": ("m", "dm"),
    "meterToFathom": ("m", "fathom"),
    "meterToFoot": ("m", "foot"),
    "meterToInch": ("m", "inch"),
    "meterToKilometer": ("m", "km"),
    "meterToLink": ("m", "link"),
    "meterToMile": ("m", "mile"),
    "meterToMillimeter": ("m", "mm"),
    "meterToNauticalMile": ("m", "nauticalmile"),
    "meterToUSFoot": ("m", "usfoot"),
    "meterToUSInch": ("m", "usinch"),
    "meterToUSMile": ("m", "usmile"),
    "meterToUSYard": ("m", "usyard"),
    "mileToMeter": ("mile", "m"),
    "millimeterToMeter": ("mm", "m"),
    "nauticalMileToMeter": ("nauticalmile", "m"),
    "yardToMeter": ("yard", "m"),
}
for _name, (_f, _t) in _UNITS.items():
    _reg(_name, (lambda f, t: (lambda c: V.convert_unit(c, f, t)))(_f, _t), "x")

_reg("st_toDegrees", V.to_degrees, "x")
_reg("st_toRadians", V.to_radians, "x")

# ----------------------------------------------------------- bbox relations --

def _bb(fn, flip=False):
    """bbox_* helpers are pure Catalyst over BOUNDS STRUCTS (the ingest
    pipeline precomputes bounds); the registry adapts geometry args."""

    def wrapped(a, b):
        ba, bb_ = V.st_bounds(a), V.st_bounds(b)
        return fn(bb_, ba) if flip else fn(ba, bb_)

    return wrapped


_reg("st_bboxabove", _bb(V.bbox_above), "g", "g2")
_reg("st_bboxbelow", _bb(V.bbox_below), "g", "g2")
_reg("st_bboxcontains", _bb(V.bbox_contains), "g", "g2")
_reg("st_bboxintersect", _bb(V.bbox_intersects), "g", "g2")
_reg("st_bboxfpintersects", _bb(V.bbox_intersects), "g", "g2")
_reg("st_bboxleftof", _bb(V.bbox_left_of), "g", "g2")
_reg("st_bboxrightof", _bb(V.bbox_right_of), "g", "g2")
_reg("st_bboxiscontainedby", _bb(V.bbox_contains, flip=True), "g", "g2")
# NULL guard is explicit: Spark's NaN = NaN is TRUE, so two NULL/empty
# geometries' NaN envelopes would otherwise compare bbox-equal
_reg(
    "st_bboxequals",
    lambda a, b: F.when(
        a.isNull() | b.isNull(), F.lit(None)
    ).otherwise(V.st_bounds(a) == V.st_bounds(b)),
    "g",
    "g2",
)
_reg(
    "st_bboxdistance",
    lambda a, b: V.st_distance(V.st_envelope(a), V.st_envelope(b)),
    "g",
    "g2",
)
# PostGIS operators |&>, &<|, &<, &> ("overlaps or is above/below/left/right")
_reg(
    "st_bboxoverlapsabove",
    lambda a, b: V.st_bounds(a)["ymin"] >= V.st_bounds(b)["ymin"],
    "g",
    "g2",
)
_reg(
    "st_bboxoverlapsbelow",
    lambda a, b: V.st_bounds(a)["ymax"] <= V.st_bounds(b)["ymax"],
    "g",
    "g2",
)
_reg(
    "st_bboxoverlapsleft",
    lambda a, b: V.st_bounds(a)["xmax"] <= V.st_bounds(b)["xmax"],
    "g",
    "g2",
)
_reg(
    "st_bboxoverlapsright",
    lambda a, b: V.st_bounds(a)["xmin"] >= V.st_bounds(b)["xmin"],
    "g",
    "g2",
)
_reg("st_makeEnvelope", T2.st_makeenvelope, L(0.0), L(0.0), L(4.0), L(4.0))
_reg("st_octogonalEnvelope", A.st_octogonalenvelope, "g")

# -------------------------------------------------------- geometry.attribute --

_reg("st_Length", V.st_length, "gline")
_reg("st_Length2D", V.st_length, "gline")
_reg("st_Length3D", A.st_length3d, "glz")
_reg("st_area", V.st_area, "g")
_reg("st_boundary", A.st_boundary, "g")
_reg("st_boundingdiagonal", A.st_boundingdiagonal, "g")
_reg("st_centroid", RS.st_centroid_geom, "g")
_reg("st_closestPointOfApproach", A.st_closestpointofapproach, "glm", "glm2")
_reg("st_compactnessRatio", A.st_compactnessratio, "g")
_reg("st_concaveHull", SH.st_concavehull, "gmp", L(10.0))
_reg("st_convexHull", V.st_convexhull, "gmp")
_reg("st_dimension", A.st_dimension, "g")
_reg("st_geometryN", A.st_geometryn, "gcoll", L(1))
_reg("st_geometryType", V.st_geometrytype, "g")
_reg("st_hasHorizontalCRS", A.st_hashorizontalcrs, "g")
_reg("st_hasRepeatedPoints", A.st_hasrepeatedpoints, "gline")
_reg("st_is3D", A.st_is3d, "glz")
_reg("st_isCollection", A.st_iscollection, "gcoll")
_reg("st_isMeasured", A.st_ismeasured, "glm")
_reg("st_isPlanar", A.st_isplanar, "g")
_reg("st_isRectangle", A.st_isrectangle, "g")
_reg("st_isSolid", A.st_issolid, "g")
_reg("st_isSquare", A.st_issquare, "g")
_reg("st_isValidDetail", A.st_isvaliddetail, "g")
_reg("st_isValidReason", SH.st_isvalidreason, "g")
_reg("st_minimumBoundingCircle", SH.st_minimumboundingcircle, "gmp")
_reg("st_minimumBoundingCircleCenter", A.st_minimumboundingcirclecenter, "gmp")
_reg("st_minimumBoundingRadius", A.st_minimumboundingradius, "gmp")
_reg("st_minimumClearance", A.st_minimumclearance, "gline")
_reg("st_minimumClearanceLine", A.st_minimumclearanceline, "gline")
_reg("st_minimumDiameter", SH.st_minimumdiameter, "gmp")
_reg("st_minimumDiameterLine", A.st_minimumdiameterline, "gmp")
_reg("st_minimumRectangle", SH.st_minimumrectangle, "gmp")
_reg("st_nDims", A.st_ndims, "glz")
_reg("st_nPoints", V.st_npoints, "gline")
_reg("st_numPoints", V.st_npoints, "gline")
_reg("st_numDistinctGeometries", A.st_numdistinctgeometries, "gcoll")
_reg("st_numDistinctPoints", A.st_numdistinctpoints, "gline")
_reg("st_numGeometries", A.st_numgeometries, "gcoll")
_reg("st_numPatches", A.st_numpatches, "gmpoly")
_reg("st_patchN", A.st_patchn, "gmpoly", L(1))
_reg("st_perimeter", V.st_perimeter, "g")
_reg("st_perimeter2D", V.st_perimeter, "g")
_reg("st_perimeter3D", A.st_perimeter3d, "g")
_reg("st_pointN", A.st_pointn, "gline", L(2))
_reg("st_pointOnSurface", SH.st_pointonsurface, "g")

# ----------------------------------------------------------- point.attribute --

_reg("st_angle", A.st_angle, "gpt", "gpt2", "gpt3")
_reg("st_isPointInRing", A.st_ispointinring, "gpt", "g")
_reg("st_isPointOnLine", A.st_ispointonline, "gpt", "gline")
_reg("st_m", Z.st_m, "glm")
_reg("st_mMax", Z.st_mmax, "glm")
_reg("st_mMin", Z.st_mmin, "glm")
_reg("st_pointInsideCircle", A.st_pointinsidecircle, "gpt", L(0.0), L(0.0), L(10.0))
_reg("st_x", V.st_x, "gpt")
_reg("st_y", V.st_y, "gpt")
_reg("st_xMax", A.st_xmax, "g")
_reg("st_xMin", A.st_xmin, "g")
_reg("st_yMax", A.st_ymax, "g")
_reg("st_yMin", A.st_ymin, "g")
_reg("st_z", Z.st_z, "glz")
_reg("st_zMax", Z.st_zmax, "glz")
_reg("st_zMin", Z.st_zmin, "glz")
_reg("st_zmFlag", Z.st_zmflag, "glm")

# --------------------------------------------------------- polygon.attribute --

_reg("st_circularity", A.st_circularity, "g")
_reg("st_interiorRingN", A.st_interiorringn, "ghole", L(1))
_reg("st_isAcute", A.st_isacute, "gtri")
_reg("st_isConvex", A.st_isconvex, "g")
_reg("st_isEquilateralTriangle", A.st_isequilateraltriangle, "gtri")
_reg("st_isIsocelesTriangle", A.st_isisoscelestriangle, "gtri")
_reg("st_isPolygonCCW", A.st_ispolygonccw, "g")
_reg("st_isPolygonCW", A.st_ispolygoncw, "g")
_reg("st_isRightTriangle", A.st_isrighttriangle, "gtri")
_reg("st_isTriangle", A.st_istriangle, "gtri")
_reg("st_nRings", A.st_nrings, "ghole")
_reg("st_numInteriorRings", V.st_numinteriorrings, "ghole")
_reg("st_orientation", A.st_orientation, "g")

# ------------------------------------------------------ linestring.attribute --

_reg("st_LengthToPoint", A.st_lengthtopoint, "gline", "gpt")
_reg("st_endPoint", A.st_endpoint, "gline")
_reg("st_isClosed", A.st_isclosed, "gline")
_reg("st_isNodingValid", A.st_isnodingvalid, "gline")
_reg("st_isRing", A.st_isring, "gline")
_reg("st_isValidTrajectory", A.st_isvalidtrajectory, "glm")
_reg("st_lineInterpolatePoint", V.st_lineinterpolatepoint, "gline", L(0.5))
_reg("st_lineInterpolatePoints", A.st_lineinterpolatepoints, "gline", L(0.25))
_reg("st_lineSelfIntersectionPoint", A.st_lineselfintersectionpoint, "glx")
_reg("st_selfIntersections", A.st_selfintersections, "glx")
_reg("st_sharedPaths", A.st_sharedpaths, "gline", "gline2")
_reg("st_startPoint", A.st_startpoint, "gline")
_reg("st_interpolatePoint", A.st_interpolatepoint, "glm", "gpt")
_reg("st_lineLocatePoint", V.st_linelocatepoint, "gline", L(1.0), L(1.0))

# -------------------------------------------------------- geometry.relation --

_reg("st_3dclosestpoint", R2.st_3dclosestpoint, "glz", "glz2")
_reg("st_closestPoint3d", R2.st_3dclosestpoint, "glz", "glz2")
_reg("st_3ddwithin", R2.st_3ddwithin, "glz", "glz2", L(100.0))
_reg("st_dwithin3d", R2.st_3ddwithin, "glz", "glz2", L(100.0))
_reg("st_3dlongestLine", R2.st_3dlongestline, "glz", "glz2")
_reg("st_3dmaxDistance", R2.st_maxdistance3d, "glz", "glz2")
_reg("st_maxDistance3D", R2.st_maxdistance3d, "glz", "glz2")
_reg("st_3dshortestline", R2.st_3dshortestline, "glz", "glz2")
_reg("st_shortestLine3D", R2.st_3dshortestline, "glz", "glz2")
_reg("st_distance3d", R2.st_distance3d, "glz", "glz2")
_reg("st_areasimilarity", R2.st_areasimilarity, "g", "g2")
_reg("st_centroidDistance", V.st_centroid_distance, "g", "g2")
_reg("st_closestCooordinate", R2.st_closestcoordinate, "g", "gpt")
_reg("st_furthestCoordinate", R2.st_furthestcoordinate, "g", "gpt")
_reg("st_closestPoint", V.st_closestpoint, "g", "gpt")
_reg("st_distance", V.st_distance, "g", "g2")
# geof:distance — BONUS surface beyond PostGISConfig (the GeoSPARQL core
# function): SRID-keyed dispatch, geographic → great-circle (Vincenty on the
# nearest vertex pair), projected → planar (GeometryWrapper.java:676-686)
_reg("geof_distance", V.geof_distance, "g", "g2", L(4326))
_reg("st_distancesphere", RS.st_distancesphere_geom, "gpt", "gpt2")
_reg("st_equalSRS", R2.st_equalsrs, "sridc", "sridc")
_reg("st_equalType", R2.st_equaltype, "g", "g2")
_reg("st_equalsNorm", R2.st_equalsnorm, "g", "g2")
_reg("st_equalsTopo", R.st_equals_topo, "g", "g2")
_reg("st_frechetDistance", V.st_frechetdistance, "gline", "gline2")
_reg("st_hausdorffDistance", V.st_hausdorffdistance, "gline", "gline2")
_reg("st_intersectionMatrix", R.st_relate, "g", "g2")
_reg("st_intersectionPercentage", V.st_intersection_percentage, "g", "g2")
_reg("st_isMorePrecise", R2.st_ismoreprecise, "g", "g2")
_reg("st_longestLine", V.st_longestline, "g", "g2")
_reg("st_maxDistance", V.st_maxdistance, "g", "g2")
_reg("st_orderingEquals", R2.st_orderingequals, "g", "g2")
_reg("st_relate", R.st_relate, "g", "g2")
_reg("st_relateMatch", R.st_relate_match_strings, L("212101212"), L("212101212"))
_reg("st_shortestLine", V.st_shortestline, "g", "g2")
_reg("st_lineCrossingDirection", R2.st_linecrossingdirection, "gline", "gline2")
_reg("st_unaryUnion", T2.st_unaryunion, "gmpoly")
_reg("st_union", V.st_union, "g", "g2")

# --------------------------------------- shared relation.* dispatch classes --

_reg("st_contains", V.st_contains, "g", "gpt")
_reg("st_containsProperly", RS.st_containsproperly, "g", "gpt")
_reg("st_coveredBy", R.st_coveredby, "g", "g2")
_reg("st_covers", R.st_covers, "g", "g2")
_reg("st_crosses", R.st_crosses, "gline", "gline2")
_reg("st_disjoint", V.st_disjoint, "g", "g2")
_reg("st_equals", R.st_equals_topo, "g", "g2")
_reg("st_dWithin", V.st_dwithin, "g", "g2", L(10.0))
_reg("st_intersects", V.st_intersects, "g", "g2")
_reg("st_intersection", V.st_intersection, "g", "g2")
_reg("st_overlaps", R.st_overlaps, "g", "g2")
_reg("st_touches", R.st_touches, "g", "g2")
_reg("st_within", V.st_within, "gpt", "g")
_reg("st_symDifference", V.st_symdifference, "g", "g2")

# -------------------------------------------------------- geometry.transform --

_reg("st_clipByBox2D", V.st_clip_by_box, "g", L(0.0), L(0.0), L(2.0), L(2.0))
_reg("st_collectionExtract", T2.st_collectionextract, "gcoll", L(1))
_reg("st_collectionHomogenize", T2.st_collectionhomogenize, "gcoll")
_reg("st_delaunayTriangles", SH.st_delaunaytriangles, "gmp")
_reg("st_densify", SH.st_densify, "gline", L(2))
_reg("st_flipCoordinates", V.st_flipcoordinates, "g")
_reg("st_force2d", Z.st_force2d, "glz")
_reg("st_force3d", Z.st_force3dz, "g", L(0.0))
_reg("st_force3dm", Z.st_force3dm, "g", L(0.0))
_reg("st_force3dz", Z.st_force3dz, "g", L(0.0))
_reg("st_force4d", T2.st_force4d, "g", L(0.0), L(0.0))
_reg("st_forceCollection", T2.st_forcecollection, "g")
_reg("st_forceCurve", T2.st_forcecurve, "gline")
_reg("st_forceLHR", T2.st_forcelhr, "g")
_reg("st_forceSFS", T2.st_forcesfs, "g")
_reg("st_makeValid", SH.st_makevalid, "g")
_reg("st_multi", T2.st_multi, "g")
_reg("st_node", T2.st_node, "glx")
_reg("st_normalize", SH.st_normalize, "g")
_reg("st_points", T2.st_points, "g")
_reg("st_polygonize", T2.st_polygonize, "glx")
_reg("st_precisionReducer", T2.st_precisionreducer, "g", L(2.0))
_reg("st_reflect", T2.st_reflect, "g", "gline")
_reg("st_reverse", V.st_reverse, "gline")
_reg("st_rotate", TR.st_rotate, "g", L(0.5))
_reg("st_rotateX", T2.st_rotatex, "glz", L(0.5))
_reg("st_rotateY", T2.st_rotatey, "glz", L(0.5))
_reg("st_rotateZ", T2.st_rotatez, "g", L(0.5))
_reg("st_scale", TR.st_scale, "g", L(2.0), L(3.0))
_reg("st_shiftLongitude", T2.st_shiftlongitude, "g")
_reg("st_simplify", V.st_simplify, "gline", L(0.5))
_reg("st_simplifyPreserveTopology", T2.st_simplifypreservetopology, "g", L(0.5))
_reg("st_simplifyVW", SH.st_simplifyvw, "gline", L(0.5))
_reg("st_snap", SH.st_snap, "gline", "gline2", L(0.5))
_reg("st_split", SH.st_split, "gline", "gline2")
_reg("st_straightSkeleton", T2.st_straightskeleton, "g")
_reg("st_swapOrdinates", T2.st_swapordinates, "g", L("xy"))
_reg("st_transform", TR.st_transform, "g", L(4326), L(3857))
_reg("transform", TR.st_transform, "g", L(4326), L(3857))
_reg("st_translate", V.st_translate, "g", L(1.0), L(2.0))
_reg("st_transscale", T2.st_transscale, "g", L(1.0), L(1.0), L(2.0), L(2.0))
_reg("st_voronoiLines", T2.st_voronoilines, "gmp")
_reg("st_voronoiPolygons", SH.st_voronoipolygons, "gmp")

# ------------------------------------------------------ linestring.transform --

_reg("st_curveToLine", T2.st_curvetoline, "gline")
_reg("st_lineMerge", SH.st_linemerge, "gmline")
_reg("st_lineSubstring", SH.st_linesubstring, "gline", L(0.2), L(0.8))
_reg("st_lineToCurve", T2.st_linetocurve, "gline")
_reg("st_offsetCurve", T2.st_offsetcurve, "gline", L(1.0))
_reg("st_segmentize", SH.st_segmentize, "gline", L(1.0))

# --------------------------------------------------------- polygon.transform --

_reg("st_forcePolygonCCW", T2.st_forcepolygonccw, "g")
_reg("st_forcePolygonCW", T2.st_forcepolygoncw, "g")
_reg("st_reverseRing", T2.st_reversering, "ghole", L(0))
_reg("st_shearTransformation", TR.st_shear, "g", L(0.5), L(0.0))

# ---------------------------------------------------------------- editors --

_reg("st_addgeometry", T2.st_addgeometry, "gcoll", "gpt")
_reg("st_addz", T2.st_addz, "g", L(5.0))
_reg("st_ensureClosed", V.st_ensureclosed, "g")
_reg("st_multiplyz", T2.st_multiplyz, "glz", L(2.0))
_reg("st_removePoints", T2.st_removepoints, "gline", "g2")
_reg("st_removeRepeatedPoints", V.st_removerepeatedpoints, "gline", L(0.0))
_reg("st_removegeometry", T2.st_removegeometry, "gcoll", L(0))
_reg("st_setGeometry", T2.st_setgeometry, "gcoll", "gpt", L(0))
_reg("st_addpoint", V.st_addpoint, "gline", L(9.0), L(9.0), L(-1))
_reg("st_removePoint", V.st_removepoint, "gline", L(1))
_reg("st_setEndPoint", T2.st_setendpoint, "gline", "gpt")
_reg("st_setPoint", V.st_setpoint, "gline", L(0), L(9.0), L(9.0))
_reg("st_setStartPoint", T2.st_setstartpoint, "gline", "gpt")
_reg("st_addRing", V.st_addring, "g", "gring")
_reg("st_removeRing", V.st_removering, "ghole", L(0))
_reg("st_setRing", T2.st_setring, "ghole", L(0), "gring")

# ------------------------------------------------------------- constructors --

_reg("st_geomFromGML", E.st_geomfromgml, "gmls")
_reg("st_gmlToSQL", E.st_geomfromgml, "gmls")
_reg("st_geomFromGeoHash", RS.st_geomfromgeohash, "ghs")
_reg("st_geomFromGeoJSON", V.st_geomfromgeojson, "gj")
_reg("st_geomFromKML", E.st_geomfromkml, "kmls")
_reg("st_geomFromText", V.st_geomfromtext, "wkt_poly")
_reg("st_wktToSQL", V.st_geomfromtext, "wkt_poly")
_reg("st_geomFromWKB", RS.st_geomfromwkb, "g")
_reg("st_wkbToSQL", RS.st_geomfromwkb, "g")
_reg("st_makeCircle", T2.st_makecircle, "gpt", L(2.0))
_reg("st_makeEllipse", T2.st_makeellipse, "gpt", L(2.0), L(4.0))
_reg("st_generatePoints", T2.st_generatepoints, "g", L(5))
_reg("st_mPointFromText", RS.st_mpointfromtext, "wkt_mpoint")
_reg("st_makePoint", RS.st_makepoint, L(1.0), L(2.0))
_reg("st_makePointM", RS.st_makepointm, L(1.0), L(2.0), L(3.0))
_reg("st_pointFromGeoHash", RS.st_pointfromgeohash_geom, "ghs")
_reg("st_pointFromText", RS.st_pointfromtext, "wkt_point")
_reg("st_pointFromWKB", RS.st_pointfromwkb, "gpt")
_reg("st_lineFromEncodedPolyline", RS.st_linefromencodedpolyline, "plstr", L(5))
_reg("st_lineFromMultiPoint", T2.st_linefrommultipoint, "gmp")
_reg("st_lineFromText", RS.st_linefromtext, "wkt_line")
_reg("st_lineFromWKT", RS.st_linefromtext, "wkt_line")
_reg("st_lineFromWKB", RS.st_linefromwkb, "gline")
_reg("st_mLineFromText", RS.st_mlinefromtext, "wkt_mline")
_reg("st_makeLine", T2.st_makeline, "gline", "gline2")
_reg("st_mPolyFromText", RS.st_mpolyfromtext, "wkt_mpoly")
_reg("st_makePolygon", T2.st_makepolygon, "glinec")
_reg("st_polygonFromText", RS.st_polygonfromtext, "wkt_poly")
_reg("st_polygonFromWKB", RS.st_polygonfromwkb, "g")
_reg("st_polygon", T2.st_makepolygon, "glinec")
_reg("st_tesselate", T2.st_tesselate, "g")
_reg("st_azimuth", TR.st_azimuth, L(0.0), L(0.0), L(1.0), L(1.0))
_reg("st_geometricMedian", SH.st_geometricmedian, "gmp")

# ---------------------------------------------------------------- exporters --

_reg("st_asbinary", E2.st_asbinary, "g")
_reg("st_aswkb", E2.st_asbinary, "g")
_reg("st_asgeojson", V.st_asgeojson, "g")
_reg("st_asgeojsonld", E2.st_asgeojsonld, "g")
_reg("st_asgeorss", E.st_asgeorss, "gpt")
_reg("st_asgeouri", RS.st_asgeouri, "gpt")
_reg("st_asgml", E.st_asgml, "g")
_reg("st_asgpx", E.st_asgpx, "gline")
_reg("st_ashexewkb", E2.st_ashexewkb, "g")
_reg("st_askml", E.st_askml, "g")
_reg("st_aslatlontext", E.st_aslatlontext, "gpt")
_reg(
    "st_asmvtgeom",
    E2.st_asmvtgeom,
    "g",
    L(0.0),
    L(0.0),
    L(16.0),
    L(16.0),
    L(4096.0),
)
_reg("st_aspolyshape", E2.st_aspolyshape, "gpt")
_reg("st_assvg", E.st_assvg, "g")
_reg("st_astext", V.st_astext, "g")
_reg("st_aswkt", V.st_astext, "g")
_reg("st_astextraw", V.st_astext, "g")
_reg("st_astextround", E2.st_astextround, "g", L(2.0))
_reg("st_astopojson", E2.st_astopojson, "g")
_reg("st_astwkb", E.st_astwkb, "g", L(5))
_reg("st_asx3d", E.st_asx3d, "g")
_reg("st_osmlink", E.st_asosmlink, "gpt")
_reg("st_asencodedpolyline", C.st_asencodedpolyline, "gline")
_reg("st_dumpRings", A.st_dumprings, "ghole")

# --------------------------------------------------------------------- SRID --

_reg("st_epsgToSRID", RS.st_epsgtosrid, "epsgs")
_reg("st_setSRID", SR.st_setsrid, ("pylit", 3857))
_reg("st_srid", SR.st_srid, "sridc")
_reg("st_sridGetAxis1Name", RS.st_sridgetaxis1name, "sridc")
_reg("st_sridGetAxis1Orientation", RS.st_sridgetaxis1orientation, "sridc")
_reg("st_sridGetAxis2Name", RS.st_sridgetaxis2name, "sridc")
_reg("st_sridGetAxis2Orientation", RS.st_sridgetaxis2orientation, "sridc")
_reg("st_sridHasFlippedAxis", RS.st_sridhasflippedaxis, "sridc")
_reg("st_sridToEPSG", RS.st_sridtoepsg, "sridc")
_reg("st_rast_srid", RT.rt_srid, "rast")

# ----------------------------------------------------- clustering / M-coord --

_reg("st_accum", T2.st_accum, "gpt", "gpt2")
_reg("st_clusterIntersecting", T2.st_clusterintersecting, "gmpoly")
_reg("st_clusterKMeans", T2.st_clusterkmeans, "gmp", L(2))
_reg("st_clusterWithin", T2.st_clusterwithin, "gmp", L(2.0))
_reg("st_filterByM", T2.st_filterbym, "glm", L(1.0), L(9.0), L(True))
_reg("st_filterByT", RS.st_filterbyt, "glm", L(1.0), L(9.0))
_reg("st_locateAlong", T2.st_locatealong, "gline", L(0.5), L(0.0))
_reg("st_locateBetween", T2.st_locatebetween, "glm", L(1.0), L(9.0), L(0.0))
_reg("st_locateBetweenElevations", Z.st_locate_between_elevations, "glz", L(0.0), L(10.0))

# ---------------------------------------------------------- raster algebra --

for _op, _impl in (
    ("add", "add"),
    ("subtract", "subtract"),
    ("mult", "multiply"),
    ("div", "divide"),
    ("min", "min"),
    ("max", "max"),
    ("mean", "mean"),
    ("and", "and"),
    ("or", "or"),
    ("xor", "xor"),
):
    _reg(f"st_rast_algebra_{_op}", RS.rast2_udf(_impl), "rast", "rast2")
for _op, _impl in (
    ("addconst", "add"),
    ("subtractconst", "subtract"),
    ("subtractfromconst", "subtractfromconst"),
    ("multconst", "multiply"),
    ("divconst", "divide"),
    ("andconst", "and"),
    ("orconst", "or"),
    ("xorconst", "xor"),
):
    _reg(f"st_rast_algebra_{_op}", RS.rastconst_udf(_impl), "rast", L(-1.0), L(2.0))
_reg("st_rast_algebra_abs", RS.rast1_udf("abs"), "rast")
_reg("st_rast_algebra_exp", RS.rast1_udf("exp"), "rast")
_reg("st_rast_algebra_log", RS.rast1_udf("log"), "rast")
_reg("st_rast_algebra_not", RS.rt_not, "rast")
_reg("st_rast_algebra_binarize", RS.rt_binarize, "rast", L(2.0))
_reg("st_rast_algebra_clamp", RS.rt_clamp, "rast", L(1.0), L(3.0))
_reg("st_rast_algebra_threshold", RS.rt_threshold, "rast", L(1.0), L(3.0), L(0.0))
_reg("st_rast_algebra_constant", RS.rt_constant, "rast", L(7.0))
_reg("st_rast_algebra_crop", RS.rt_crop, "rast", L(0.0), L(0.0), L(2.0), L(2.0))
_reg("st_rast_algebra_dct", RS.rt_dct, "rast")
_reg("st_rast_algebra_idct", RS.rt_idct, "rast")
_reg("st_rast_algebra_minfilter", RS.rt_minfilter, "rast")
_reg("st_rast_algebra_maxfilter", RS.rt_maxfilter, "rast")
_reg("st_rast_algebra_medianfilter", RS.rt_medianfilter, "rast")

# -------------------------------------------------------- raster attributes --

_reg("st_width", RT.rt_width, "rast")
_reg("st_height", RT.rt_height, "rast")
_reg("st_numBands", RT.rt_numbands, "rast")
_reg("st_scaleX", RT.rt_scalex, "rast")
_reg("st_scaleY", RT.rt_scaley, "rast")
_reg("st_skewX", RT.rt_skewx, "rast")
_reg("st_skewY", RT.rt_skewy, "rast")
_reg("st_upperLeftX", RT.rt_upperleftx, "rast")
_reg("st_upperLeftY", RT.rt_upperlefty, "rast")
_reg("st_pixelWidth", RT.rt_pixelwidth, "rast")
_reg("st_pixelHeight", RT.rt_pixelheight, "rast")
_reg("st_memsize", RT.rt_memsize, "rast")
_reg("st_summary", RT.rt_summary, "rast")
_reg("st_summaryStats", RTR.st_summarystats, "rast")
_reg("st_isEmpty", RT.rt_isempty, "rast")
_reg("st_rast_isEmpty", RT.rt_isempty, "rast")
_reg("st_isTiled", RT.rt_istiled, "rast")
_reg("st_mintilex", RT.rt_mintilex, "rast")
_reg("st_mintiley", RT.rt_mintiley, "rast")
_reg("st_numXTiles", RT.rt_numxtiles, "rast")
_reg("st_numYTiles", RT.rt_numytiles, "rast")
_reg("st_tilewidth", RT.rt_tilewidth, "rast")
_reg("st_tileheight", RT.rt_tileheight, "rast")
_reg("st_tilegridxoffset", RT.rt_tilegridxoffset, "rast")
_reg("st_tilegridyoffset", RT.rt_tilegridyoffset, "rast")
_reg("st_isGrayscale", RT.rt_isgrayscale, "rast")
_reg("st_isIndexed", RT.rt_isindexed, "rast")
_reg("st_isTranslucent", RT.rt_istranslucent, "rast")
_reg("st_hasNoBand", RT.rt_hasnoband, "rast", L(0))
_reg("st_band", RT.rt_band, "rast", L(0))
_reg("st_bandmetadata", RT.rt_bandmetadata, "rast", L(0))
_reg("st_bandnodatavalue", RT.rt_bandnodatavalue, "rast", L(0))
_reg("st_bandpixeltype", RT.rt_bandpixeltype, "rast", L(0))
_reg("st_worldToRasterCoord", RT.rt_worldtorastercoord, "rast", L(1.0), L(1.0))
_reg("st_worldToRasterCoordX", RT.rt_worldtorastercoordx, "rast", L(1.0), L(1.0))
_reg("st_worldToRasterCoordY", RT.rt_worldtorastercoordy, "rast", L(1.0), L(1.0))
_reg("st_rasterToWorldCoord", RT.rt_rastertoworldcoord, "rast", L(1), L(1))
_reg("st_rasterToWorldCoordX", RT.rt_rastertoworldcoordx, "rast", L(1), L(1))
_reg("st_rasterToWorldCoordY", RT.rt_rastertoworldcoordy, "rast", L(1), L(1))

# --------------------------------------------------------- raster relations --

_reg("st_rast_Contains", RT.rt_contains, "rast", "rast2")
_reg("st_rast_Covers", RT.rt_covers, "rast", "rast2")
_reg("st_rast_CoveredBy", RT.rt_coveredby, "rast", "rast2")
_reg("st_rast_Crosses", RT.rt_crosses, "rast", "rast2")
_reg("st_rast_Disjoint", RT.rt_disjoint, "rast", "rast2")
_reg("st_rast_Intersects", RT.rt_intersects, "rast", "rast2")
_reg("st_rast_Intersection", RT.rt_intersection_geom, "rast", "rast2")
_reg("st_rast_Overlaps", RT.rt_overlaps, "rast", "rast2")
_reg("st_rast_Touches", RT.rt_touches, "rast", "rast2")
_reg("st_rast_Within", RT.rt_within, "rast", "rast2")

# ---------------------------------------- raster constructors / transforms --

_reg("st_makeEmptyRaster", RT.rt_makeemptyraster, L(4), L(4), L(0.0), L(4.0), L(1.0))
_reg(
    "st_makeEmptyCoverage",
    RT.rt_makeemptycoverage,
    L(2),
    L(2),
    L(4),
    L(4),
    L(0.0),
    L(4.0),
    L(1.0),
)
_reg("st_rastFromHexWKB", RT.rt_fromhexwkb, "rasthex")
_reg("st_rastFromWKB", RT.rt_fromwkb, "rast")
_reg("st_aspng", RTR.st_aspng, "rast")
_reg("st_asjpg", RT.rt_asjpg, "rast")
_reg("st_astiff", RT.rt_astiff, "rast")
# CoverageJSON literal codec — BONUS surface (the reference ships
# AsCoverageJSON/RastFromCoverageJSON + CovJSONDatatype but never puts them
# in PostGISConfig, so they are outside the 423-name parity set)
_reg("st_ascoveragejson", RT.rt_ascoveragejson, "rast")
_reg("st_rastfromcoveragejson", RT.rt_fromcoveragejson, "covjson")
# XYZ / ASCIIGrid / GeoTIFF-read raster literals — BONUS surface (the
# reference lists all three as "Planned further implementations",
# README.md:412-421, and never ships them)
_reg("st_asxyz", RT.rt_asxyz, "rast")
_reg("st_rastfromxyz", RT.rt_fromxyz, "xyzs")
_reg("st_asasciigrid", RT.rt_asasciigrid, "rast")
_reg("st_rastfromasciigrid", RT.rt_fromasciigrid, "aaigs")
_reg("st_rastfromtiff", RT.rt_fromtiff, "tiffb")
_reg("st_asnetcdf", RT.rt_asnetcdf, "rast")
_reg("st_rastfromnetcdf", RT.rt_fromnetcdf, "ncb")
_reg("st_resize", RTR.st_resize, "rast", L(2), L(2))
_reg("st_reskew", RS.rastfn_udf(__import__("jena_geo_spark.raster.transform", fromlist=["set_skew"]).set_skew, 2, "rt_reskew"), "rast", L(0.1), L(0.1))
_reg("st_retile", RS.rt_retile, "rast", L(2), L(2))
_reg("st_addband", RS.rt_addband_const, "rast", L(1.0))
_reg("st_nearestValue", RTR.st_nearestvalue, "rast", L(1.0), L(1.0))
_reg("st_pixelAsCentroid", RT.rt_pixelascentroid, "rast", L(1), L(1))
_reg("st_pixelAsCentroids", RT.rt_pixelascentroids, "rast")
_reg("st_pixelAsPoint", RT.rt_pixelaspoint, "rast", L(1), L(1))
_reg("st_pixelAsPoints", RT.rt_pixelaspoints, "rast")
_reg("st_pixelAsPolygon", RT.rt_pixelaspolygon, "rast", L(1), L(1))

# --------------------------------------------------- filter-function names --

_reg("st_isSimple", A.st_issimple, "g")
_reg("st_isValid", SH.st_isvalid, "g")


def sample_frame(spark):
    """One-row DataFrame with every column kind the argspecs reference —
    the execution target for tests/test_registry.py."""
    import numpy as np

    from ..geom import wkt as W
    from ..geom.wkt import Geom
    from ..raster import wkb_raster as WR
    from . import exporters as EX

    def wkb(wkt):
        return bytearray(W.to_wkb(W.from_wkt(wkt)))

    def rast(vals, ipx=0.0, ipy=4.0):
        r = WR.Raster(0, 1.0, -1.0, ipx, ipy, 0.0, 0.0, 4326, 4, 4, [])
        r.bands.append(WR.Band(11, -1.0, np.array(vals, dtype=np.float64).reshape(4, 4)))
        return WR.encode(r)

    poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    row = {
        "g": wkb(poly),
        "g2": wkb("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
        "ghole": wkb("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"),
        "gtri": wkb("POLYGON ((0 0, 4 0, 2 3, 0 0))"),
        "gpt": wkb("POINT (1 1)"),
        "gpt2": wkb("POINT (3 1)"),
        "gpt3": wkb("POINT (3 3)"),
        "gline": wkb("LINESTRING (0 0, 4 0, 4 4)"),
        "gline2": wkb("LINESTRING (0 2, 4 2, 6 6)"),
        "glinec": wkb("LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"),
        "glx": wkb("LINESTRING (0 0, 4 4, 4 0, 0 4)"),
        "glm": wkb("LINESTRING M (0 0 0, 5 0 5, 10 0 10)"),
        "glm2": wkb("LINESTRING M (0 1 0, 5 1 5, 10 1 10)"),
        "glz": wkb("LINESTRING Z (0 0 0, 5 0 5)"),
        "glz2": wkb("LINESTRING Z (0 3 0, 5 3 4)"),
        "gmp": wkb("MULTIPOINT ((0 0), (1 0), (0 1), (5 5), (6 5))"),
        "gmline": wkb("MULTILINESTRING ((0 0, 2 0), (2 0, 4 1))"),
        "gmpoly": wkb(
            "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
        ),
        "gcoll": wkb("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))"),
        "gring": wkb("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
        "wkt_point": "POINT (1 2)",
        "wkt_line": "LINESTRING (0 0, 1 1)",
        "wkt_poly": poly,
        "wkt_mpoint": "MULTIPOINT ((1 1), (2 2))",
        "wkt_mline": "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "wkt_mpoly": "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "gj": '{"type": "Point", "coordinates": [1.0, 2.0]}',
        "gmls": EX.to_gml(W.from_wkt("POINT (1 2)")),
        "kmls": EX.to_kml(W.from_wkt("POINT (1 2)")),
        "ghs": "u4pruyd",
        "plstr": "_p~iF~ps|U_ulLnnqC",
        "epsgs": "EPSG:3857",
        "sridc": 4326,
        "x": 2.5,
        "rast": bytearray(rast(range(16))),
        "covjson": __import__(
            "jena_geo_spark.raster.covjson", fromlist=["raster_to_covjson"]
        ).raster_to_covjson(WR.decode(rast(range(16)))),
        "xyzs": __import__(
            "jena_geo_spark.raster.grids", fromlist=["raster_to_xyz"]
        ).raster_to_xyz(WR.decode(rast(range(16)))),
        "aaigs": __import__(
            "jena_geo_spark.raster.grids", fromlist=["raster_to_aaigrid"]
        ).raster_to_aaigrid(WR.decode(rast(range(16)))),
        "tiffb": bytearray(
            __import__(
                "jena_geo_spark.raster.tiff", fromlist=["encode_tiff"]
            ).encode_tiff(WR.decode(rast(range(16))))
        ),
        "rast2": bytearray(rast(range(16, 32), ipx=2.0, ipy=6.0)),
        "ncb": bytearray(
            __import__(
                "jena_geo_spark.raster.netcdf", fromlist=["raster_to_netcdf"]
            ).raster_to_netcdf(WR.decode(rast(range(16))))
        ),
        "rasthex": WR.encode_hex(WR.decode(rast(range(16)))),
    }
    return spark.createDataFrame([row])


def invoke(name: str, df):
    """Column for REGISTRY[name] applied to the sample frame's columns."""
    fn, args = REGISTRY[name.lower()]
    cols = []
    for a in args:
        if isinstance(a, tuple) and a[0] == "lit":
            cols.append(F.lit(a[1]))
        elif isinstance(a, tuple) and a[0] == "pylit":
            cols.append(a[1])
        else:
            cols.append(df[a])
    return fn(*cols)


def missing_names() -> list:
    """Reference names not yet wired (must stay empty — test-enforced)."""
    return sorted(set(n.lower() for n in REF_NAMES) - set(REGISTRY))


def extra_names() -> list:
    return sorted(set(REGISTRY) - set(n.lower() for n in REF_NAMES))
