"""Checkpoint/lineage/resume semantics (parquet + manifest)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from jena_geo_spark.operators.checkpoint import TileCheckpointer


@pytest.fixture()
def tiled(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("tile_id"),
        F.concat(F.lit("cap_"), F.col("id")).alias("caption"),
    )


def test_write_commit_resume(spark, tiled, tmp_path):
    out = str(tmp_path / "ck")
    ck = TileCheckpointer(out, lineage="test@v1")
    m1 = ck.write(tiled)
    assert len(m1) == 7 and sum(v["n_rows"] for v in m1.values()) == 1000
    assert all(v["lineage"] == "test@v1" and v["n_bytes"] > 0 for v in m1.values())
    # resume: nothing new
    m2 = ck.write(tiled)
    assert m2 == {}
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 1000


def test_partial_commit_then_resume(spark, tiled, tmp_path):
    out = str(tmp_path / "ck2")
    ck = TileCheckpointer(out, lineage="test@v1")
    ck.write(tiled.filter(F.col("tile_id") < 3))  # first batch commits tiles 0-2
    m2 = ck.write(tiled)  # resume commits only tiles 3-6
    assert sorted(m2) == [3, 4, 5, 6]
    assert spark.read.parquet(f"{out}/data").count() == 1000


def test_crash_between_data_and_manifest_is_idempotent(spark, tiled, tmp_path):
    out = str(tmp_path / "ck3")
    ck = TileCheckpointer(out, lineage="test@v1")
    ck.write(tiled)
    os.remove(os.path.join(out, "_manifest.json"))  # lose the commit record
    TileCheckpointer(out, lineage="test@v1").write(tiled)  # retry everything
    assert spark.read.parquet(f"{out}/data").count() == 1000  # no duplicates


def test_manifest_is_valid_json_with_metrics(spark, tiled, tmp_path):
    out = str(tmp_path / "ck4")
    TileCheckpointer(out, lineage="job=42").write(tiled)
    with open(os.path.join(out, "_manifest.json")) as f:
        m = json.load(f)
    assert m["lineage"] == "job=42"
    assert set(m["tiles"]) == {str(i) for i in range(7)}
    t0 = m["tiles"]["0"]
    assert {"tile_id", "n_rows", "n_bytes", "lineage", "committed_at"} <= set(t0)
