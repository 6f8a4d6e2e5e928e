"""jena_geo_spark — PySpark-native spatial-join + tiling engine.

From-scratch reimplementation of the query/data-processing capabilities of
``analyticservicedev/jena-geo`` (a GeoSPARQL+ ARQ extension; reference at
/root/reference), re-architected for Spark: DataFrame/Catalyst plans,
vectorised pandas/Arrow UDFs over pure-numpy geometry kernels, a quadtree
cell grid (H3/S2 role) for distributed spatial joins, explicit
partitioning/skew handling, and parquet-manifest checkpoint/resume.

Query surfaces: the Python operator/column-function API (``operators/``,
``functions/``), and the reference's production SPARQL service
(``sparql.py``: SELECT subset → DataFrame plans, spatial predicates
rewritten to the cover/grid joins; ``benchmark.py``: the
/service/benchmark folder walker).
"""

__version__ = "0.1.0"
