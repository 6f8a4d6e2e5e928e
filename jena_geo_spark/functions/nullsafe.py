"""SQL NULL propagation for pandas-UDF bodies.

``null_safe`` wraps a pandas-series function so that rows where ANY input
series is None/NaN produce None instead of reaching the body (which
typically starts with ``W.from_wkb(x)`` and would crash the whole Spark
task on a NULL geometry).  Non-null rows are computed in one sub-batch,
so the vectorized body keeps its batch shape.

Apply UNDER ``@pandas_udf`` (so it wraps the series function, not the
Column factory)::

    @pandas_udf(BinaryType())
    @null_safe
    def st_foo(b: pd.Series) -> pd.Series: ...

The reference host (jena ARQ) raises ExprEvalException per-row for
unbound arguments, which SPARQL semantics turn into an unbound result —
the relational equivalent IS the NULL result, so None-in/None-out matches
the reference surface.
"""

from __future__ import annotations

import functools

import pandas as pd

__all__ = ["null_safe"]


def null_safe(fn):
    @functools.wraps(fn)
    def wrapper(*series):
        mask = None
        for s in series:
            m = s.isna()
            mask = m.values if mask is None else (mask | m.values)
        if mask is None or not mask.any():
            return fn(*series)
        keep = ~mask
        # run the body on the (possibly empty) non-null subset — the empty
        # call still tells us whether this UDF returns a Series or a
        # struct DataFrame, which the reassembly below must match.  Bodies
        # that peek at scalar args (e.g. `srid.iloc[0]`) raise on the empty
        # batch; all-null output is a plain Series either way.
        sub = [s[keep].reset_index(drop=True) for s in series]
        if not keep.any():
            try:
                res = fn(*sub)
            except Exception:
                return pd.Series([None] * len(mask), dtype=object)
        else:
            res = fn(*sub)
        if isinstance(res, pd.DataFrame):
            # struct-returning UDF (numeric fields, e.g. st_bounds): NULL
            # input rows become NaN rows — the "null envelope" convention
            # empty geometries already use
            import numpy as np

            out = pd.DataFrame(
                np.full((len(mask), res.shape[1]), np.nan), columns=res.columns
            )
            out.iloc[keep] = res.values
            return out
        out = pd.Series([None] * len(mask), dtype=object)
        out.iloc[keep] = list(res)
        return out

    return wrapper
