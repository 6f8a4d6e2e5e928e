r"""Property-based fuzz over the 1D line×line boolean overlay
(geom/linework.py — reference geof:difference/intersection/union/
symDifference on lineal inputs, ``GeometryWrapper.java:715-808``).

Both r3-ADVICE bugs in this kernel (a non-canonical empty MULTIPOINT and
a dropped transversal crossing when 1D overlap coexists) were shapes a
length-conservation sweep would have caught, so the invariants are pinned
here over adversarial integer-grid chains where collinear partial
overlaps, shared endpoints, and vertex-exact crossings are common:

  L(A\B) + L(A∩B) = L(A)
  L(B\A) + L(A∩B) = L(B)
  L(A∪B)          = L(A) + L(B) − L(A∩B)
  L(AΔB)          = L(A) + L(B) − 2·L(A∩B)
  L(A∩B)          = L(B∩A)                       (symmetry)

Chains are strictly x-increasing (x-monotone), so no chain overlaps
itself and the 1D measure of each input is exactly the sum of its
segment lengths.  Isolated 0D crossings have measure zero and must not
perturb any of the identities; line_intersection_mixed additionally must
report each crossing point as lying on both inputs and OFF the shared
linework.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jena_geo_spark.geom import linework as L


@st.composite
def xmono_chain(draw):
    n = draw(st.integers(2, 5))
    xs = sorted(draw(st.sets(st.integers(0, 8), min_size=n, max_size=n)))
    ys = [draw(st.integers(0, 6)) for _ in xs]
    return np.array(list(zip(xs, ys)), dtype=np.float64)


def total_len(chains):
    return float(
        sum(np.sum(np.hypot(*(np.diff(c, axis=0).T))) for c in chains)
    )


def _on_chain(pt, chains, eps):
    return bool(L._pts_on_chains(np.asarray([pt]), chains, eps)[0])


@settings(max_examples=300, deadline=None)
@given(xmono_chain(), xmono_chain())
def test_line_overlay_length_conservation(a, b):
    A, B = [a], [b]
    la, lb = total_len(A), total_len(B)
    li = total_len(L.line_overlay(A, B, "intersection"))
    tol = 1e-7 * max(1.0, la + lb)

    assert abs(total_len(L.line_overlay(B, A, "intersection")) - li) <= tol
    assert abs(total_len(L.line_overlay(A, B, "difference")) + li - la) <= tol
    assert abs(total_len(L.line_overlay(B, A, "difference")) + li - lb) <= tol
    assert abs(total_len(L.line_overlay(A, B, "union")) - (la + lb - li)) <= tol
    assert (
        abs(total_len(L.line_overlay(A, B, "symdifference")) - (la + lb - 2 * li))
        <= tol
    )


@settings(max_examples=300, deadline=None)
@given(xmono_chain(), xmono_chain())
def test_line_intersection_mixed_points(a, b):
    A, B = [a], [b]
    chains, pts = L.line_intersection_mixed(A, B)
    eps = L._overlay_eps(A, B)
    for p in np.asarray(pts).reshape(-1, 2):
        # every reported crossing lies on BOTH inputs...
        assert _on_chain(p, A, eps) and _on_chain(p, B, eps)
        # ...and not on the shared 1D linework (no double-reporting)
        if chains:
            assert not _on_chain(p, chains, eps)
