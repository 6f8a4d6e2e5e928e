"""SQL NULL propagation for pandas-UDF bodies.

``null_safe`` wraps a pandas-series function so that rows where ANY input
series is None/NaN produce None instead of reaching the body (which
typically starts with ``W.from_wkb(x)`` and would crash the whole Spark
task on a NULL geometry).  ``empty_geom_null`` additionally masks rows
whose WKB geometry arguments are EMPTY geometries — for operators with no
defined result on an empty operand (distances, interpolation, editors),
where the reference host throws ExprEvalException per row, which SPARQL
semantics turn into an unbound (= NULL) result.  Non-masked rows are
computed in one sub-batch, so the vectorized body keeps its batch shape.

Apply UNDER ``@pandas_udf`` (so it wraps the series function, not the
Column factory)::

    @pandas_udf(BinaryType())
    @null_safe
    def st_foo(b: pd.Series) -> pd.Series: ...
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

__all__ = ["null_safe", "empty_geom_null"]


def _masked_call(fn, series, mask):
    """Run ``fn`` on the rows where ``mask`` is False; masked rows → None
    (NaN row for struct-returning bodies)."""
    if not mask.any():
        return fn(*series)
    keep = ~mask
    # run the body on the (possibly empty) non-masked subset — the empty
    # call still tells us whether this UDF returns a Series or a struct
    # DataFrame, which the reassembly below must match.  Bodies that peek
    # at scalar args (e.g. `srid.iloc[0]`) raise on the empty batch;
    # all-masked output is a plain Series either way.
    sub = [s[keep].reset_index(drop=True) for s in series]
    if not keep.any():
        try:
            res = fn(*sub)
        except (IndexError, KeyError, ValueError):
            # empty-batch probe only: bodies that peek at scalar args
            # (`srid.iloc[0]`) or reduce over rows can't run on zero rows.
            # Genuine body defects (imports, type errors) still propagate.
            return pd.Series([None] * len(mask), dtype=object)
    else:
        res = fn(*sub)
    if isinstance(res, pd.DataFrame):
        # struct-returning UDF (numeric fields, e.g. st_bounds): masked
        # rows become NaN rows — the "null envelope" convention empty
        # geometries already use
        out = pd.DataFrame(
            np.full((len(mask), res.shape[1]), np.nan), columns=res.columns
        )
        out.iloc[keep] = res.values
        return out
    out = pd.Series([None] * len(mask), dtype=object)
    out.iloc[keep] = list(res)
    return out


def null_safe(fn):
    @functools.wraps(fn)
    def wrapper(*series):
        mask = None
        for s in series:
            m = s.isna()
            mask = m.values if mask is None else (mask | m.values)
        if mask is None:
            return fn(*series)
        return _masked_call(fn, series, mask)

    return wrapper


def _is_empty_geom(v) -> bool:
    if not isinstance(v, (bytes, bytearray)):
        return False
    from ..geom import wkt as W

    try:  # header-only check — no second full parse per row
        return W.wkb_is_empty(v)
    except Exception:  # not geometry WKB (e.g. raster bytes) — leave alone
        return False


def empty_geom_null(fn):
    """None AND empty-geometry args → None result (see module docstring).
    Subsumes ``null_safe`` — don't stack both."""

    @functools.wraps(fn)
    def wrapper(*series):
        mask = np.zeros(len(series[0]), dtype=bool)
        for s in series:
            mask |= s.isna().values
            if s.dtype == object:
                for i, v in enumerate(s):
                    if not mask[i] and _is_empty_geom(v):
                        mask[i] = True
        return _masked_call(fn, series, mask)

    return wrapper
