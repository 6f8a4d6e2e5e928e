"""File sources beyond parquet: newline-delimited GeoJSON (GeoJSONL).

The reference loads RDF (Turtle — ``jena_geo_spark.sparql`` has the
reader) and serializes results as GeoJSON FeatureCollections
(``operators/geojson_sink.py``); this module closes the loop with the
READ side for feature data.  The scale-correct interchange format is
one Feature per line (GeoJSONL / ndjson): a FeatureCollection is a
single JSON document and cannot be split across executors, while a
line-delimited file parallelizes like any text source.
"""

from .geojson import read_geojson_collection, read_geojsonl

__all__ = ["read_geojsonl", "read_geojson_collection"]
