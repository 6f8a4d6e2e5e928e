"""GeoJSON result sinks — the DataFrame counterpart of the reference's
binding→GeoJSON serialization (``TripleStoreConnection.java:83-186``:
result vars ending in ``_geom`` become Feature geometries, the remaining
vars become Feature properties, and the response is one FeatureCollection;
AsGeoJSON conversion at ``:142-148``).

Two shapes, matching how each is used at scale:

* :func:`write_geojsonseq` — RFC 8142 newline-delimited GeoJSON text
  sequences, fully distributed: every task serializes its own partition,
  no driver involvement.  This is the 100-TB sink (one Feature per line is
  also what big GIS loaders — GDAL GeoJSONSeq, tippecanoe — stream).
* :func:`featurecollection_json` — one in-memory FeatureCollection string,
  the HTTP-endpoint response analogue.  Collects to the driver by design
  (an HTTP response is driver-sized); ``max_rows`` guards against
  accidentally materializing a frame-scale result.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..geom import wkt as W


def _feature_expr(df: DataFrame, geom_col: str, wkb: bool):
    """Column serializing each row as one GeoJSON Feature string.

    Geometry decode + JSON assembly run in ONE Arrow-batched UDF over the
    geometry column and a pre-built JSON properties string (built by
    ``to_json(struct(...))`` JVM-side, so property serialization stays in
    whole-stage codegen)."""
    from pyspark.sql.functions import pandas_udf

    prop_cols = [c for c in df.columns if c != geom_col]
    props = (
        F.to_json(F.struct(*[F.col(c) for c in prop_cols]))
        if prop_cols
        else F.lit("{}")
    )

    @pandas_udf(StringType())
    def feature(geom: pd.Series, props_json: pd.Series) -> pd.Series:
        out = []
        for g, p in zip(geom, props_json):
            # GeoJSON allows null-geometry Features; dropping the row
            # would silently lose bindings (the reference serializes
            # every solution)
            gj = (
                "null"
                if g is None
                else W.to_geojson(W.from_wkb(bytes(g)) if wkb else W.from_wkt(g))
            )
            out.append(
                '{"type": "Feature", "geometry": %s, "properties": %s}'
                % (gj, p if p is not None else "{}")
            )
        return pd.Series(out, dtype=object)

    return feature(F.col(geom_col), props)


def write_geojsonseq(
    df: DataFrame, path: str, geom_col: str = "geom", wkb: bool = True, mode: str = "overwrite"
) -> None:
    """Write the frame as newline-delimited GeoJSON Features (RFC 8142 /
    GDAL ``GeoJSONSeq``) — distributed text write, one Feature per line."""
    df.select(_feature_expr(df, geom_col, wkb).alias("value")).write.mode(
        mode
    ).text(path)


def featurecollection_json(
    df: DataFrame, geom_col: str = "geom", wkb: bool = True, max_rows: int = 100_000
) -> str:
    """One GeoJSON FeatureCollection string of the whole result — the
    reference endpoint's response shape.  Driver-side by design; raises if
    the result exceeds ``max_rows`` (use :func:`write_geojsonseq` then)."""
    feats = (
        df.select(_feature_expr(df, geom_col, wkb).alias("f"))
        .limit(max_rows + 1)
        .collect()
    )
    if len(feats) > max_rows:
        raise ValueError(
            f"featurecollection_json: result exceeds max_rows={max_rows}; "
            "use write_geojsonseq for frame-scale exports"
        )
    return '{"type": "FeatureCollection", "features": [%s]}' % ", ".join(
        r.f for r in feats
    )


def read_geojsonseq(spark, path: str, geom_col: str = "geom") -> DataFrame:
    """Read RFC 8142 GeoJSON lines back: geometry as WKB plus a
    ``properties`` JSON string column (schema inference over free-form
    properties is the caller's concern — ``F.from_json`` with their
    schema)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from pyspark.sql.types import StructField, StructType

    lines = spark.read.text(path)

    # ONE json.loads per line: a single UDF returns (geometry, properties)
    @pandas_udf(
        StructType(
            [
                StructField("g", BinaryType()),
                StructField("p", StringType()),
            ]
        )
    )
    def parse(s: pd.Series) -> pd.DataFrame:
        gs, ps = [], []
        for x in s:
            d = json.loads(x)
            geo = d.get("geometry")
            gs.append(
                None if geo is None else W.to_wkb(W.from_geojson(json.dumps(geo)))
            )
            ps.append(json.dumps(d.get("properties") or {}))
        return pd.DataFrame({"g": gs, "p": ps})

    parsed = lines.select(parse(F.col("value")).alias("f"))
    return parsed.select(
        F.col("f.g").alias(geom_col), F.col("f.p").alias("properties")
    )
