"""Spark UDFs for DE-9IM relate + the full topological predicate family.

Reference registrations: ``PostGISConfig.java`` sfEquals/sfTouches/
sfCrosses/sfOverlaps/sfContains/sfWithin/sfIntersects + ehCovers/
ehCoveredBy and ``geof:relate``/``relateMatch`` (``IntersectionMatrixTest``
golden 0FFFFFFF2 reproduced in tests).  Exact edge-aware semantics from
``geom/relate.py`` — replaces the r1 vertex-conservative predicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

from ..geom import relate as R
from ..geom import wkt as W
from .nullsafe import null_safe


@pandas_udf(StringType())
@null_safe
def st_relate(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [R.relate(W.from_wkb(x), W.from_wkb(y)) for x, y in zip(a, b)]
    )


@pandas_udf(BooleanType())
@null_safe
def st_relate_match(a: pd.Series, b: pd.Series, pattern: pd.Series) -> pd.Series:
    return pd.Series(
        [
            R.relate_match(R.relate(W.from_wkb(x), W.from_wkb(y)), p)
            for x, y, p in zip(a, b, pattern)
        ],
        dtype=object,
    )


@pandas_udf(BooleanType())
def st_relate_match_strings(matrix: pd.Series, pattern: pd.Series) -> pd.Series:
    """PostGIS ST_RelateMatch(matrix, pattern) over two DE-9IM strings —
    the reference's registered signature (RelateMatch.java is a
    FunctionBase2 over two strings; its body is plain equality, we
    implement the documented OGC pattern match, which agrees on the
    reference's test vectors — RelateMatchTest.java)."""
    return pd.Series(
        [
            None if m is None or p is None else R.relate_match(m, p)
            for m, p in zip(matrix, pattern)
        ],
        dtype=object,
    )


def _pred_udf(fn):
    @null_safe
    def wrapped(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(W.from_wkb(x), W.from_wkb(y)) for x, y in zip(a, b)],
            dtype=object,
        )

    wrapped.__name__ = fn.__name__
    return pandas_udf(wrapped, BooleanType())


st_touches = _pred_udf(R.touches)
st_crosses = _pred_udf(R.crosses)
st_overlaps = _pred_udf(R.overlaps)
st_equals_topo = _pred_udf(R.equals_topo)
st_covers = _pred_udf(R.covers)
st_coveredby = _pred_udf(R.covered_by)
st_contains_exact = _pred_udf(R.contains)
st_within_exact = _pred_udf(R.within)
st_intersects_exact = _pred_udf(R.intersects)
st_disjoint_exact = _pred_udf(R.disjoint)
