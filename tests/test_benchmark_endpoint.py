"""Benchmark endpoint (jena_geo_spark/benchmark.py) vs
``benchmark/BenchmarkExecutor.java:28-205`` response semantics."""

import pytest

from jena_geo_spark import benchmark as B
from jena_geo_spark import sparql as S

TTL = """
@prefix geo: <http://www.opengis.net/ont/geosparql#> .
@prefix : <http://example.org/> .
:a_geom geo:asWKT "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"^^geo:wktLiteral .
:b_geom geo:asWKT "POINT (1 1)"^^geo:wktLiteral .
"""


@pytest.fixture(scope="module")
def queryfolder(tmp_path_factory):
    root = tmp_path_factory.mktemp("queries")
    d = root / "vector" / "attribute"
    d.mkdir(parents=True)
    (d / "area_filter.sparql").write_text(
        "SELECT ?g WHERE { ?g geo:asWKT ?w . FILTER(geo2:ST_Area(?w) > 10) }"
    )
    (d / "all_geoms.sparql").write_text("SELECT ?g ?w WHERE { ?g geo:asWKT ?w }")
    (d / "notes.txt").write_text("ignored: wrong extension")
    d2 = root / "vector" / "export"
    d2.mkdir(parents=True)
    (d2 / "astext.sparql").write_text(
        "SELECT ?c WHERE { ?g geo:asWKT ?w . BIND(geo2:ST_Centroid(?w) AS ?c) }"
    )
    return str(root)


def test_benchmark_shape_and_sizes(spark, queryfolder):
    models = {"testdata.ttl": S.TriplesModel(S.triples_from_turtle(spark, TTL))}
    res = B.benchmark(spark, queryfolder, models, dataset="all")
    assert set(res) == {"vector_attribute", "vector_export"}
    cat = res["vector_attribute"]
    assert set(cat) == {"array", "cattotal", "catobjtotal"}
    arr = cat["array"]
    assert set(arr) == {"area_filter", "all_geoms"}
    assert arr["area_filter"]["resultsize"] == 1
    assert arr["all_geoms"]["resultsize"] == 2
    assert arr["area_filter"]["dataset"] == "testdata.ttl"
    assert arr["area_filter"]["result"] > 0
    assert cat["catobjtotal"] == 3
    assert cat["cattotal"] >= arr["area_filter"]["result"]
    assert res["vector_export"]["array"]["astext"]["resultsize"] == 2


def test_benchmark_unknown_dataset(spark, queryfolder):
    with pytest.raises(KeyError):
        B.benchmark(spark, queryfolder, {}, dataset="nope")
