"""Mimic the driver's correctness gate: run each queries()[name] on Spark at
sf0.01 and the matching oracle_sql()[name] in DuckDB; compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def _rows_to_set(cols, rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(qdf.columns)
    spark_rows = [[row[c] for c in spark_cols] for row in qdf.collect()]

    cur = ddb.execute(ORACLES[name])
    ora_cols_raw = [d[0] for d in cur.description]
    ora_rows_raw = cur.fetchall()
    order = sorted(range(len(ora_cols_raw)), key=lambda i: ora_cols_raw[i])
    ora_cols = [ora_cols_raw[i] for i in order]
    ora_rows = [[r[i] for i in order] for r in ora_rows_raw]

    assert spark_cols == ora_cols, f"{name}: columns {spark_cols} != {ora_cols}"
    assert len(spark_rows) == len(ora_rows), (
        f"{name}: rowcount {len(spark_rows)} != {len(ora_rows)}"
    )
    s, o = _rows_to_set(spark_cols, spark_rows), _rows_to_set(ora_cols, ora_rows)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
