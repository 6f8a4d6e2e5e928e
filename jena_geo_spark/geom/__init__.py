from .wkt import Geom, from_geojson, from_wkb, from_wkt, to_geojson, to_wkb, to_wkt  # noqa: F401
