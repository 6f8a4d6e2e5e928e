"""Batch zone-visit sessionization — the pure-Catalyst twin of the
streaming ``stream_zone_visits`` stateful operator.

Semantics (shared with the streaming form): a visit = a maximal run of an
entity's points inside one zone with inter-point gaps ≤ ``gap_seconds``.
Batch expresses it with window functions only — lag-based break flags and
a running sum assign session ids, one ``groupBy`` folds each session —
so the whole plan is two window stages + one aggregation, no UDF, fully
whole-stage-codegen, and SQL-oracle-verifiable (the driver contract runs
the identical window algebra in DuckDB).

Scale shape: one shuffle on the entity key for the window, reused by the
groupBy (same partitioning); state never materialises — the running sum
IS the session id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize_visits(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    zone_col: str = "zone_id",
    order_tiebreak: str | list[str] | None = None,
    gap_seconds: int = 3600,
) -> DataFrame:
    """(entity, zone, enter_ts, exit_ts, n_points) per maximal visit run.

    ``order_tiebreak``: optional column(s) making the per-entity ordering
    total when timestamps can tie (deterministic results).  Gap tests run
    on ``unix_micros`` — integer microseconds, exactly mirrored by the
    SQL oracle's ``epoch_us`` (second-truncating forms would disagree on
    sub-second timestamps)."""
    if isinstance(order_tiebreak, str):
        order_tiebreak = [order_tiebreak]
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_tiebreak or [])
    ]
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_zone = F.lag(F.col(zone_col)).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev_zone.isNull()
        | (prev_zone != F.col(zone_col))
        | (
            # NTZ-safe: session TZ is UTC, so the cast preserves the
            # wall-clock value and micros match DuckDB's epoch_us
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev_ts.cast("timestamp"))
            > F.lit(gap_seconds * 1_000_000)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sid = F.sum(brk).over(wsum)
    return (
        df.withColumn("_sid", sid)
        .groupBy(entity_col, "_sid")
        .agg(
            F.min(zone_col).alias(zone_col),
            F.min(ts_col).alias("enter_ts"),
            F.max(ts_col).alias("exit_ts"),
            F.count("*").alias("n_points"),
        )
        .select(entity_col, zone_col, "enter_ts", "exit_ts", "n_points")
    )
