"""Property-based WKT/WKB codec fuzz: round-trips must be exact for every
geometry kind × dims combination, including empties and single-point parts
(hypothesis; complements the fixed goldens in test_reference_goldens.py)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jena_geo_spark.geom import wkt as W

DIMS = ("XY", "XYZ", "XYM", "XYZM")

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def pts(n_min, n_max, width):
    return st.lists(
        st.tuples(*([coord] * width)), min_size=n_min, max_size=n_max
    ).map(lambda rows: np.array(rows, dtype=np.float64))


@st.composite
def geoms(draw):
    dims = draw(st.sampled_from(DIMS))
    w = len(dims)
    kind = draw(
        st.sampled_from(
            ["point", "linestring", "polygon", "multipoint",
             "multilinestring", "multipolygon"]
        )
    )
    def ring():
        body = draw(pts(3, 6, w))
        return np.vstack([body, body[:1]])
    if kind == "point":
        parts = [draw(pts(1, 1, w))]
    elif kind in ("linestring",):
        parts = [draw(pts(2, 8, w))]
    elif kind == "multipoint":
        parts = [draw(pts(1, 6, w))]
    elif kind == "multilinestring":
        parts = [draw(pts(2, 5, w)) for _ in range(draw(st.integers(1, 3)))]
    elif kind == "polygon":
        parts = [ring() for _ in range(draw(st.integers(1, 3)))]
    else:  # multipolygon
        parts = [
            [ring() for _ in range(draw(st.integers(1, 2)))]
            for _ in range(draw(st.integers(1, 3)))
        ]
    return W.Geom(kind, parts, dims)


@settings(max_examples=200, deadline=None)
@given(geoms())
def test_wkb_roundtrip_exact(g):
    rt = W.from_wkb(W.to_wkb(g))
    assert rt.kind == g.kind and rt.dims == g.dims
    assert np.array_equal(rt.all_coords(), g.all_coords())
    assert not W.wkb_is_empty(W.to_wkb(g))


@settings(max_examples=200, deadline=None)
@given(geoms())
def test_wkt_roundtrip_exact(g):
    rt = W.from_wkt(W.to_wkt(g))
    assert rt.kind == g.kind and rt.dims == g.dims
    np.testing.assert_array_equal(rt.all_coords(), g.all_coords())


def _canon(g):
    """+0.0 for every -0.0 — WKT text normalizes the zero sign, WKB keeps
    the bit; the cross-check compares the value, not the sign of zero."""

    def fix(parts):
        return [
            [np.asarray(r) + 0.0 for r in p] if isinstance(p, list) else np.asarray(p) + 0.0
            for p in parts
        ]

    return W.Geom(g.kind, fix(g.parts), g.dims)


@settings(max_examples=100, deadline=None)
@given(geoms())
def test_wkt_wkb_cross(g):
    """WKT path and WKB path must agree bit-for-bit (modulo -0.0)."""
    g = _canon(g)
    assert W.to_wkb(W.from_wkt(W.to_wkt(g))) == W.to_wkb(g)


# ---- st_removeRepeatedPoints structural properties (reference semantics) --


@st.composite
def _dup_lines(draw):
    """Linestrings with injected duplicates at random positions."""
    base = draw(pts(2, 8, 2))
    dups = draw(st.integers(0, 3))
    c = base
    for _ in range(dups):
        i = draw(st.integers(0, len(c) - 1))
        j = draw(st.integers(0, len(c)))
        c = np.insert(c, j, c[i], axis=0)
    return W.Geom("linestring", [c])


@given(_dup_lines(), st.sampled_from([0.0, 1e-9, 0.5]))
@settings(max_examples=300, deadline=None)
def test_remove_repeated_points_properties(g, tol):
    """Idempotence + structural invariants of the reference's global
    both-copy removal (RemoveRepeatedPointsTest.java semantics): no output
    point is within tolerance of another, line parts never fall below 2
    points, and a second application is the identity."""
    import pandas as pd

    from jena_geo_spark.functions.vector import st_removerepeatedpoints

    def run(wkb_bytes):
        return st_removerepeatedpoints.func(
            pd.Series([wkb_bytes]), pd.Series([tol])
        ).iloc[0]

    out1 = run(W.to_wkb(g))
    g1 = W.from_wkb(out1)
    for p in g1.parts:
        # a fully-collapsed line decodes from WKB as one 0-point part
        # (canonical EMPTY) — the invariant is "never exactly 1 point"
        assert len(p) != 1
        if len(p) > 1:
            d = np.abs(p[:, None, :2] - p[None, :, :2])
            eq = (d <= tol).all(axis=2)
            np.fill_diagonal(eq, False)
            assert not eq.any(), "output still contains repeats"
    assert run(out1) == out1, "not idempotent"
