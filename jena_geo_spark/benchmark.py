"""Benchmark endpoint parity: walk a query folder, time each query.

Mirrors ``benchmark/BenchmarkExecutor.java:28-205`` (reached via
``GET /service/benchmark``, ``example/ExampleWebService.java:42-45``):
queries live under ``<queryfolder>/<datatype>/<category>/*.sparql``;
each file is executed against one dataset (or every registered model for
``dataset="all"``), and the response JSON carries, per
``<datatype>_<category>`` key, an ``array`` of per-query records
``{experiment, result (wall ms), dataset, resultsize}`` plus category
totals ``cattotal`` (ms) and ``catobjtotal`` (rows) —
``BenchmarkExecutor.java:92-110``.  The reference's SQL mirror mode
(PostGIS over JDBC, ``:71-89``) is out of scope here: our SQL
equivalence story is the per-query DuckDB oracle gate in
``contract.py``, which is stronger (value-hash equality, not just
timing).

Spark note: each query compiles through :mod:`jena_geo_spark.sparql`
into a DataFrame plan, so the measured time is a real distributed
execution (count action), not a driver loop.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def benchmark(
    spark: SparkSession,
    queryfolder: str,
    models: dict[str, object],
    dataset: str = "all",
    fileending: str = "sparql",
) -> dict:
    """Run every ``*.sparql`` under ``queryfolder/<datatype>/<category>/``
    against the selected model(s); return the reference's response JSON
    shape.  ``models`` maps dataset name → sparql backend (TriplesModel /
    PropertyTable / UnionModel), the reference's ``modelmap``."""
    from . import sparql as S

    targets = list(models) if dataset == "all" else [dataset]
    for t in targets:
        if t not in models:
            raise KeyError(f"unknown dataset {t!r}; registered: {sorted(models)}")

    out: dict[str, dict] = {}
    for datatype in sorted(
        d for d in os.listdir(queryfolder) if os.path.isdir(os.path.join(queryfolder, d))
    ):
        dt_dir = os.path.join(queryfolder, datatype)
        for cat in sorted(
            d for d in os.listdir(dt_dir) if os.path.isdir(os.path.join(dt_dir, d))
        ):
            cat_dir = os.path.join(dt_dir, cat)
            catarray: dict[str, dict] = {}
            cattotal = 0.0
            catobjtotal = 0.0
            for queryfile in sorted(os.listdir(cat_dir)):
                path = os.path.join(cat_dir, queryfile)
                if not queryfile.endswith("." + fileending) or os.path.isdir(path):
                    continue
                with open(path, encoding="utf-8") as fh:
                    content = fh.read()
                name = queryfile.rsplit(".", 1)[0]
                for model_name in targets:
                    t0 = time.perf_counter()
                    df = S.execute_query(spark, content, models[model_name])
                    result_size = df.count()
                    ms = (time.perf_counter() - t0) * 1000.0
                    # keyed per (experiment, dataset) when several models
                    # run — the reference's JSON overwrites earlier models
                    # (BenchmarkExecutor.java:96-101, last model wins) and
                    # only its flat TreeMap keeps all of them (:102-103);
                    # keeping every record is strictly more informative
                    key = name if len(targets) == 1 else f"{name};{model_name}"
                    catarray[key] = {
                        "experiment": name,
                        "result": ms,
                        "dataset": model_name,
                        "resultsize": result_size,
                    }
                    cattotal += ms
                    catobjtotal += result_size
            out[f"{datatype}_{cat}"] = {
                "array": catarray,
                "cattotal": cattotal,
                "catobjtotal": catobjtotal,
            }
    return out
