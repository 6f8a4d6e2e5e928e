import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jena_geo_spark import grid
from jena_geo_spark.geom import from_wkt
from jena_geo_spark.geom.kernel import points_in_polygon

HOUSE = (
    "POLYGON((8.286131571192028 49.993592741787,8.28627775158334 49.99350049055274,"
    "8.286228130716564 49.993466866227074,8.286079268116238 49.99355739320413,"
    "8.286131571192028 49.993592741787))"
)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-179.999, 179.999),
    st.floats(-89.999, 89.999),
    st.integers(0, grid.MAX_RES),
)
def test_encode_bounds_roundtrip(lon, lat, res):
    c = grid.encode_points(np.array([lon]), np.array([lat]), res)
    assert grid.cell_res(c)[0] == res
    xmin, ymin, xmax, ymax = grid.cell_bounds(c)
    # half-ULP quantization tolerance at cell boundaries
    ex = max(abs(lon), 360.0) * 1e-15
    ey = max(abs(lat), 180.0) * 1e-15
    assert xmin[0] - ex <= lon <= xmax[0] + ex
    assert ymin[0] - ey <= lat <= ymax[0] + ey


@settings(max_examples=100, deadline=None)
@given(st.floats(-179.9, 179.9), st.floats(-89.9, 89.9))
def test_ancestor_consistency(lon, lat):
    fine = grid.encode_points(np.array([lon]), np.array([lat]), 24)
    for r in (0, 5, 12, 20):
        assert grid.ancestor_at(fine, r)[0] == grid.encode_points(np.array([lon]), np.array([lat]), r)[0]


def test_children_partition_parent():
    c = grid.encode_points(np.array([8.28]), np.array([49.99]), 10)
    kids = grid.children(int(c[0]))
    assert len(kids) == 4
    assert (grid.parent(kids) == c[0]).all()
    # children tile the parent exactly
    pxmin, pymin, pxmax, pymax = (v[0] for v in grid.cell_bounds(c))
    kx0, ky0, kx1, ky1 = grid.cell_bounds(kids)
    assert kx0.min() == pxmin and ky0.min() == pymin
    assert kx1.max() == pxmax and ky1.max() == pymax


def test_k_ring_counts_and_wrap():
    c = grid.encode_points(np.array([179.99]), np.array([0.0]), 8)
    ring = grid.k_ring(int(c[0]), 1)
    assert len(ring) == 9  # wraps across the antimeridian, no clamp loss
    c2 = grid.encode_points(np.array([0.0]), np.array([89.9]), 8)
    ring2 = grid.k_ring(int(c2[0]), 1)
    assert len(ring2) == 6  # clamped at the pole edge


def test_cover_is_superset_and_disjoint():
    poly = from_wkt(HOUSE).exterior()
    res = grid.pick_cover_res(poly)
    cover = grid.cover_polygon(poly, max_res=res, max_cells=128)
    assert len(cover) > 0
    # disjointness: expand all to max res, no duplicates
    rmax = int(grid.cell_res(cover).max())
    desc, _ = grid.descendants_at(cover, rmax)
    assert len(np.unique(desc)) == len(desc)
    # superset: every inside point lies in some cover cell
    rng = np.random.default_rng(7)
    px = rng.uniform(poly[:, 0].min(), poly[:, 0].max(), 5000)
    py = rng.uniform(poly[:, 1].min(), poly[:, 1].max(), 5000)
    ins = points_in_polygon(px, py, poly)
    xm, ym, xM, yM = grid.cell_bounds(cover)
    covered = np.zeros(len(px), bool)
    for i in range(len(cover)):
        covered |= (px >= xm[i]) & (px < xM[i]) & (py >= ym[i]) & (py < yM[i])
    assert (~ins | covered).all()


def test_cover_point_radius_superset():
    cov = grid.cover_point_radius(10.0, 20.0, 0.5, max_res=12)
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, 2 * np.pi, 2000)
    rr = rng.uniform(0, 0.5, 2000)
    px, py = 10.0 + np.cos(ang) * rr, 20.0 + np.sin(ang) * rr
    xm, ym, xM, yM = grid.cell_bounds(cov)
    covered = np.zeros(len(px), bool)
    for i in range(len(cov)):
        covered |= (px >= xm[i]) & (px < xM[i]) & (py >= ym[i]) & (py < yM[i])
    assert covered.all()


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, 1 << 28, 1000).astype(np.uint64)
    iy = rng.integers(0, 1 << 28, 1000).astype(np.uint64)
    m = grid.morton_encode(ix, iy)
    ox, oy = grid.morton_decode(m)
    assert (ox == ix).all() and (oy == iy).all()
