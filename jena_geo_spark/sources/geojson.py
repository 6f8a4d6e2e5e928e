"""GeoJSON feature sources.

``read_geojsonl`` — the distributed path: ``spark.read.text`` splits the
file across executors, ``F.from_json`` lifts each Feature's id/
properties JVM-side (schema inferred from a driver-side sample of the
FIRST lines only, bounded), and the geometry member re-serializes
through the in-repo codec to WKB via one Arrow-batched UDF (no
shapely; ``geom/wkt.from_geojson`` is the single source of truth, the
same kernel behind the registered ``st_geomFromGeoJSON``).

``read_geojson_collection`` — the convenience path for small files: a
whole FeatureCollection document is ONE JSON value and cannot be
split, so it is parsed driver-side (size-guarded) and parallelized.

Relationship to ``operators/geojson_sink.read_geojsonseq``: that is
the untyped twin (geometry WKB + properties as a raw JSON string, no
feature id) written next to the sink; this source layer adds BOUNDED
driver-side schema inference for a typed properties struct, the
feature id, and the whole-FeatureCollection document path with a size
guard.  Reference surface parity note: the reference ships GeoJSON as
a result format (TripleStoreConnection.java:142-148) and a literal
datatype; file-level feature input is engine-added (training pipelines
ingest features from object stores as ndjson at scale).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T
from pyspark.sql.types import BinaryType

from ..geom import wkt as W

_GEOM_JSON = "geom_json"


@pandas_udf(BinaryType())
def _geojson_to_wkb(s: pd.Series) -> pd.Series:
    out = []
    for x in s:
        if x is None:
            out.append(None)
            continue
        try:
            out.append(W.to_wkb(W.from_geojson(x)))
        except Exception:
            out.append(None)  # malformed geometry → NULL, row survives
    return pd.Series(out, dtype=object)


def _lift_features(feats: DataFrame, spark: SparkSession, sample: int) -> DataFrame:
    """(raw feature-JSON strings) → typed columns.  Schema for
    id/properties is inferred from a BOUNDED driver sample; geometry
    goes through the codec UDF to WKB."""
    head = [r.value for r in feats.limit(sample).collect()]
    prop_docs = []
    for x in head:
        try:
            props = json.loads(x).get("properties") or {}
        except (json.JSONDecodeError, AttributeError):
            continue  # malformed sample line: skip for inference; the
            # distributed from_json below still NULLs it per-row
        if isinstance(props, dict):
            prop_docs.append(json.dumps(props))
    if not prop_docs:
        # empty file / zero-feature collection / all-malformed sample:
        # spark.read.json on an empty RDD raises "unable to infer schema"
        # — return the contract columns with an empty properties struct.
        props_schema = T.StructType([])
    else:
        props_schema = spark.read.json(
            spark.sparkContext.parallelize(prop_docs)
        ).schema
    parsed = feats.select(
        F.get_json_object("value", "$.id").alias("feature_id"),
        F.from_json(F.get_json_object("value", "$.properties"), props_schema).alias(
            "properties"
        ),
        F.get_json_object("value", "$.geometry").alias(_GEOM_JSON),
    )
    return parsed.select(
        "feature_id",
        "properties",
        _geojson_to_wkb(F.col(_GEOM_JSON)).alias("geom_wkb"),
    )


def read_geojsonl(
    spark: SparkSession, path: str, schema_sample: int = 1000
) -> DataFrame:
    """Newline-delimited GeoJSON Features → (feature_id, properties
    struct, geom_wkb).  Splittable text scan; only the schema sample
    touches the driver."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    return _lift_features(lines, spark, schema_sample)


def read_geojson_collection(
    spark: SparkSession, path: str, max_bytes: int = 256 << 20
) -> DataFrame:
    """A single FeatureCollection document → the same schema as
    ``read_geojsonl``.  One JSON value cannot be split, so the document
    is parsed driver-side — guarded by ``max_bytes`` (default 256 MB);
    larger inputs should be converted to GeoJSONL."""
    import os

    sz = os.path.getsize(path)
    if sz > max_bytes:
        raise ValueError(
            f"FeatureCollection is {sz} bytes > max_bytes={max_bytes}; "
            "convert to newline-delimited GeoJSON (one Feature per line) "
            "and use read_geojsonl for a splittable scan"
        )
    with open(path, "r", encoding="utf-8") as f:
        doc = json.load(f)
    feats = [json.dumps(ft) for ft in doc.get("features", [])]
    lines = spark.createDataFrame([(x,) for x in feats], "value string")
    return _lift_features(lines, spark, sample=len(feats) or 1)
