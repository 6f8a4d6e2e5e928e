"""SRID / CRS metadata functions (reference ``geometry/srid/*.java``).

No pyproj in this environment: a small registry of the CRS the engine
actually supports carries the metadata the reference exposes
(``ST_SRID``, ``ST_SetSRID``, ``ST_EPSGToSRID``, ``ST_SRIDToEPSG``,
``ST_GetAxis1/2Name``, ``ST_GetAxis1/2Orientation``,
``ST_SRIDHasFlippedAxis``).  SRID travels as a plain int column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CRS_REGISTRY = {
    4326: {
        "name": "WGS 84",
        "axis1_name": "Geodetic latitude",
        "axis2_name": "Geodetic longitude",
        "axis1_orientation": "north",
        "axis2_orientation": "east",
        "flipped_axis": True,  # EPSG order lat,lon vs internal x=lon,y=lat
        "geographic": True,
        "unit": "degree",
    },
    3857: {
        "name": "WGS 84 / Pseudo-Mercator",
        "axis1_name": "Easting",
        "axis2_name": "Northing",
        "axis1_orientation": "east",
        "axis2_orientation": "north",
        "flipped_axis": False,
        "geographic": False,
        "unit": "metre",
    },
    32632: {
        "name": "WGS 84 / UTM zone 32N",
        "axis1_name": "Easting",
        "axis2_name": "Northing",
        "axis1_orientation": "east",
        "axis2_orientation": "north",
        "flipped_axis": False,
        "geographic": False,
        "unit": "metre",
    },
}

for _code, _name in (
    (2154, "RGF93 v1 / Lambert-93"),
    (5070, "NAD83 / Conus Albers"),
    (3035, "ETRS89-extended / LAEA Europe"),
    (27700, "OSGB36 / British National Grid"),
):
    CRS_REGISTRY.setdefault(
        _code,
        {
            "name": _name,
            "axis1_name": "Easting",
            "axis2_name": "Northing",
            "axis1_orientation": "east",
            "axis2_orientation": "north",
            "flipped_axis": False,
            "geographic": False,
            "unit": "metre",
        },
    )

# the full EPSG WGS84/UTM series (32601-60 north, 32701-60 south) — all
# projected metre CRSs; st_transform supports every one of them (Snyder
# forward/inverse in functions/transform.py)
for _z in range(1, 61):
    for _code, _hemi in ((32600 + _z, "N"), (32700 + _z, "S")):
        CRS_REGISTRY.setdefault(
            _code,
            {
                "name": f"WGS 84 / UTM zone {_z}{_hemi}",
                "axis1_name": "Easting",
                "axis2_name": "Northing",
                "axis1_orientation": "east",
                "axis2_orientation": "north",
                "flipped_axis": False,
                "geographic": False,
                "unit": "metre",
            },
        )


def epsg_to_srid(epsg: str | int) -> int:
    """ST_EPSGToSRID: 'EPSG:4326' → 4326."""
    if isinstance(epsg, int):
        return epsg
    return int(str(epsg).split(":")[-1])


def srid_to_epsg(srid: int) -> str:
    return f"EPSG:{int(srid)}"


def axis_info(srid: int, axis: int) -> tuple[str, str]:
    meta = CRS_REGISTRY[int(srid)]
    return (
        meta[f"axis{axis}_name"],
        meta[f"axis{axis}_orientation"],
    )


def has_flipped_axis(srid: int) -> bool:
    return CRS_REGISTRY[int(srid)]["flipped_axis"]


def is_geographic(srid: int) -> bool:
    """Drives the distance dispatch (GeometryWrapper.java:676-686 —
    geographic → great-circle, projected → Euclidean)."""
    return CRS_REGISTRY[int(srid)]["geographic"]


def st_setsrid(srid_value: int) -> Column:
    return F.lit(int(srid_value))


def st_srid(srid_col: Column) -> Column:
    return srid_col.cast("int")
