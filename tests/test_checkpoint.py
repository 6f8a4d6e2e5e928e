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


def test_snapshot_isolation_reader_sees_only_committed(spark, tiled, tmp_path):
    """VERDICT r4 ask #8: an in-flight/crashed concurrent writer's data
    files (even torn, unreadable parquet) are invisible to ``read`` until
    their atomic manifest commit; after the commit they appear."""
    out = str(tmp_path / "ck")
    ck = TileCheckpointer(out, lineage="writer1@v1")
    ck.write(tiled)
    snap = ck.read(spark)
    assert snap.count() == 1000
    assert sorted(r.tile_id for r in snap.select("tile_id").distinct().collect()) == list(range(7))

    # concurrent writer mid-flight: a new tile dir with a HALF-WRITTEN
    # parquet file exists on disk but has no manifest entry
    torn = os.path.join(out, "data", "tile_id=99")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"PAR1\x00\x00torn-write-no-footer")
    snap2 = ck.read(spark)
    assert snap2.count() == 1000  # unchanged; the torn file is never scanned
    assert 99 not in {r.tile_id for r in snap2.select("tile_id").distinct().collect()}

    # the writer finishes: its write() replaces the torn files (dynamic
    # partition overwrite) and commits tile 99 atomically
    late = spark.range(2000, 2050).select(
        F.col("id"),
        F.lit(99).cast("long").alias("tile_id"),
        F.concat(F.lit("cap_"), F.col("id")).alias("caption"),
    )
    ck2 = TileCheckpointer(out, lineage="writer2@v1")
    m = ck2.write(late)
    assert set(m) == {99}
    snap3 = ck.read(spark)
    assert snap3.count() == 1050
    # both writers' lineages coexist in the manifest
    lineages = {v["lineage"] for v in ck.metrics().values()}
    assert lineages == {"writer1@v1", "writer2@v1"}

    # a snapshot frame pinned BEFORE a commit keeps its committed set
    ck3 = TileCheckpointer(out, lineage="writer3@v1")
    pinned = ck3.read(spark)
    even_later = late.withColumn("tile_id", F.lit(100).cast("long"))
    ck3.write(even_later)
    assert pinned.count() == 1050  # not 1100
    assert ck3.read(spark).count() == 1100


def test_snapshot_read_empty_manifest_raises(spark, tmp_path):
    ck = TileCheckpointer(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="no committed snapshot"):
        ck.read(spark)
