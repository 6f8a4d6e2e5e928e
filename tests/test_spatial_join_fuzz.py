"""Adversarial differential sweeps of the distributed spatial operators
vs exhaustive numpy oracles (FIXTURES.md §6; SURVEY §5's differential
test model).

The driver-contract oracles pin these operators at one fixed synthetic
dataset; this file sweeps the *hostile* distributions the grid machinery
must survive and that uniform-random fixtures never produce:

* point coordinates exactly ON quadtree cell boundaries (multiples of
  360/2^r are cell edges at every level ≤ r) with polygon edges aligned
  to the same lines — exercises the full-cell acceptance vs exact-PIP
  agreement on measure-zero inputs;
* massive coordinate duplication and one-hot-cell skew — the salted
  strategy's reason to exist;
* pair distances exactly AT the DWithin radius (0.25 is exactly
  representable; dx^2 = 0.0625 and sqrt are exact) — the <= boundary;
* kNN tie groups larger than k — the (dist, id) tie-break contract.

Every case compares the distributed operator pair-for-pair against a
brute-force numpy oracle built from the same exact kernel
(``points_in_polygon`` / planar distance), so any disagreement is a
plumbing bug (cover classification, cell assignment, salting, ring
expansion), not a kernel-convention mismatch.
"""

import numpy as np
import pandas as pd
import pytest

from jena_geo_spark.geom import from_wkt
from jena_geo_spark.geom.kernel import points_in_polygon
from jena_geo_spark.operators.knn import knn_join, knn_join_frames
from jena_geo_spark.operators.spatial_join import (
    build_zone_covers,
    dwithin_join_points_points,
    spatial_join_points_zones,
)

# ------------------------------------------------------------ fixtures --

# Square with every edge on a cell boundary at res<=3 (45 = 360/2^3) and
# a triangle with deliberately non-aligned vertices for contrast.
ALIGNED_ZONES = [
    ("sq", "POLYGON((0 0, 45 0, 45 45, 0 45, 0 0))"),
    ("tri", "POLYGON((-30.1 -20.7, 10.3 -40.9, 0.7 9.1, -30.1 -20.7))"),
]


def _boundary_points():
    """Points on the square's edges/corners, on interior cell boundaries
    at several levels, and epsilon-straddling pairs around both."""
    eps = 2.0**-20
    pts = []
    # corners + edge midpoints + points along each edge at cell-corner spacing
    for t in np.arange(0.0, 45.0 + 1e-9, 5.625):  # 5.625 = 360/2^6
        pts += [(t, 0.0), (t, 45.0), (0.0, t), (45.0, t)]
    # interior cell-boundary crossings (multiples of 360/2^5 = 11.25)
    for x in (11.25, 22.5, 33.75):
        for y in (11.25, 22.5, 33.75):
            pts.append((x, y))
    # epsilon straddles around the boundary lines
    for x, y in [(0.0, 22.5), (45.0, 22.5), (22.5, 0.0), (22.5, 45.0)]:
        pts += [
            (x - eps, y),
            (x + eps, y),
            (x, y - eps),
            (x, y + eps),
        ]
    # bulk filler so covers/salting see realistic volume
    rng = np.random.default_rng(3)
    pts += list(zip(rng.uniform(-60, 60, 800), rng.uniform(-60, 60, 800)))
    return pd.DataFrame(
        {
            "id": [f"p{i:05d}" for i in range(len(pts))],
            "lon": [p[0] for p in pts],
            "lat": [p[1] for p in pts],
        }
    )


def _oracle_pip(pdf: pd.DataFrame, zones) -> set[tuple[str, str]]:
    out = set()
    lon = pdf.lon.to_numpy()
    lat = pdf.lat.to_numpy()
    ids = pdf.id.to_numpy()
    for zid, wkt in zones:
        ring = from_wkt(wkt).exterior()
        ins = points_in_polygon(lon, lat, ring)
        out.update((i, zid) for i in ids[ins])
    return out


# ------------------------------------------------------------ PIP join --


@pytest.mark.parametrize("strategy", ["broadcast", "salted"])
@pytest.mark.parametrize("refine", ["udf", "catalyst"])
def test_pip_join_boundary_aligned(spark, strategy, refine):
    pdf = _boundary_points()
    covers = build_zone_covers(ALIGNED_ZONES)
    df = spark.createDataFrame(pdf)
    got = {
        (r.id, r.zone_id)
        for r in spatial_join_points_zones(
            spark, df, covers, strategy=strategy, refine=refine
        ).collect()
    }
    assert got == _oracle_pip(pdf, ALIGNED_ZONES)


@pytest.mark.parametrize("strategy", ["broadcast", "salted"])
def test_pip_join_duplicates_and_hot_cell(spark, strategy):
    """1500 of 2000 points at ONE coordinate inside the square (a single
    hot fine cell — the worst salting skew) plus uniform filler; the
    duplicate block must match or miss as a unit and semi/anti must
    partition the input exactly."""
    rng = np.random.default_rng(17)
    n_dup, n_fill = 1500, 500
    lon = np.concatenate([np.full(n_dup, 22.125), rng.uniform(-170, 170, n_fill)])
    lat = np.concatenate([np.full(n_dup, 23.875), rng.uniform(-80, 80, n_fill)])
    pdf = pd.DataFrame(
        {"id": [f"p{i:05d}" for i in range(n_dup + n_fill)], "lon": lon, "lat": lat}
    )
    covers = build_zone_covers(ALIGNED_ZONES)
    df = spark.createDataFrame(pdf)
    got = {
        (r.id, r.zone_id)
        for r in spatial_join_points_zones(
            spark, df, covers, strategy=strategy
        ).collect()
    }
    exp = _oracle_pip(pdf, ALIGNED_ZONES)
    assert got == exp
    # every duplicate row matched the square (they're interior)
    assert sum(1 for i, z in exp if z == "sq" and int(i[1:]) < n_dup) == n_dup
    semi = spatial_join_points_zones(spark, df, covers, how="semi", strategy=strategy)
    anti = spatial_join_points_zones(spark, df, covers, how="anti", strategy=strategy)
    s_ids = {r.id for r in semi.collect()}
    a_ids = {r.id for r in anti.collect()}
    assert s_ids == {i for i, _ in exp}
    assert s_ids | a_ids == set(pdf.id)
    assert not (s_ids & a_ids)


# ------------------------------------------------------------- DWithin --


def test_dwithin_exact_radius_lattice(spark):
    """Lattice with spacing exactly == radius: rook neighbours sit at
    exactly d == radius (must be INCLUDED — <= contract, exact floats),
    diagonals at radius*sqrt(2) (excluded).  The lattice spans several
    join-grid cells, so boundary pairs cross cell edges."""
    radius = 0.25
    xs = np.arange(0.0, 4.0 + 1e-9, radius)
    g = np.array([(x, y) for x in xs for y in xs])
    # shift half the lattice far away with one offset block to mix cells
    pdf = pd.DataFrame(
        {"id": [f"q{i:05d}" for i in range(len(g))], "lon": g[:, 0], "lat": g[:, 1]}
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r.id, r.id_right)
        for r in dwithin_join_points_points(spark, df, df, radius).collect()
    }
    lon, lat = g[:, 0], g[:, 1]
    d = np.sqrt((lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2)
    ii, jj = np.where(d <= radius)
    exp = {(f"q{i:05d}", f"q{j:05d}") for i, j in zip(ii, jj)}
    assert got == exp
    # the boundary really is exercised: every interior lattice point has
    # exactly 4 rook neighbours at d == radius
    n = len(xs)
    interior = (n - 2) * (n - 2)
    assert len(exp) == len(g) + 2 * (2 * n * (n - 1))  # self + rook pairs
    assert interior > 0


# ----------------------------------------------------------------- kNN --


def _tie_field():
    """Left queries at integer coordinates; right points at symmetric
    exact offsets producing tie groups of 4 (rook, d=0.25) and 4 more
    (diagonal, d=0.25*sqrt(2)) per query."""
    queries = [(f"c{i}", float(2 * (i % 3)), float(2 * (i // 3))) for i in range(9)]
    rpts = []
    for qid, cx, cy in queries:
        for dx, dy in [(0.25, 0), (-0.25, 0), (0, 0.25), (0, -0.25),
                       (0.25, 0.25), (0.25, -0.25), (-0.25, 0.25), (-0.25, -0.25)]:
            rpts.append((f"r_{qid}_{len(rpts):03d}", cx + dx, cy + dy))
    return queries, rpts


def _knn_oracle(queries, rpts, k):
    exp = {}
    for qid, cx, cy in queries:
        d = sorted(
            (np.hypot(rx - cx, ry - cy), rid) for rid, rx, ry in rpts
        )[:k]
        exp[qid] = [(rank + 1, rid) for rank, (_, rid) in enumerate(d)]
    return exp


def test_knn_tie_groups_broadcast(spark):
    """k=6 cuts through the 4-way rook tie group (takes all 4) AND the
    4-way diagonal group (takes 2 of 4 by id) — the (dist, id)
    tie-break must be deterministic and match the oracle exactly."""
    queries, rpts = _tie_field()
    pts = spark.createDataFrame(
        pd.DataFrame(rpts, columns=["event_id", "lon", "lat"])
    )
    k = 6
    got = {}
    for r in knn_join(spark, pts, queries, k).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.event_id))
    exp = _knn_oracle(queries, rpts, k)
    for qid in exp:
        assert sorted(got[qid]) == exp[qid], qid


def test_polygon_join_lattice_adversarial(spark):
    """Unit squares on an integer lattice: every rook neighbour shares a
    FULL edge, every diagonal neighbour touches at exactly one corner,
    three squares are exact duplicates, and one big square contains the
    whole grid (the a ⊇ b ancestor-emission direction).  JTS intersects
    semantics (boundary contact counts) against a closed-box oracle;
    the driver-cover and frames paths must also agree with each other."""
    from jena_geo_spark.operators.spatial_join import polygon_join, polygon_join_frames

    def sq(x, y, s=1.0):
        return (
            f"POLYGON(({x} {y}, {x + s} {y}, {x + s} {y + s}, "
            f"{x} {y + s}, {x} {y}))"
        )

    polys = [(f"g{ix}{iy}", sq(float(ix), float(iy))) for ix in range(4) for iy in range(4)]
    polys += [("d1", sq(1.0, 1.0)), ("d2", sq(1.0, 1.0))]  # duplicates of g11
    polys += [("big", sq(-0.5, -0.5, 5.0))]
    # oracle from the construction, not from WKT parsing
    geo = {f"g{ix}{iy}": (ix, iy, 1.0) for ix in range(4) for iy in range(4)}
    geo["d1"] = geo["d2"] = (1, 1, 1.0)
    geo["big"] = (-0.5, -0.5, 5.0)

    def overlap(a, b):
        ax, ay, asz = geo[a]
        bx, by, bsz = geo[b]
        return (ax <= bx + bsz and bx <= ax + asz
                and ay <= by + bsz and by <= ay + asz)

    ids = [p for p, _ in polys]
    exp = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:] if overlap(a, b)}
    exp = {(min(a, b), max(a, b)) for a, b in exp}

    got_driver = {
        (r.id_a, r.id_b) for r in polygon_join(spark, polys).collect()
    }
    pdf = spark.createDataFrame(polys, "id string, wkt string")
    got_frames = {
        (r.id_a, r.id_b) for r in polygon_join_frames(spark, pdf).collect()
    }
    assert got_driver == exp
    assert got_frames == exp


def test_knn_frames_tie_groups(spark):
    queries, rpts = _tie_field()
    ldf = spark.createDataFrame(
        pd.DataFrame(queries, columns=["id", "lon", "lat"])
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(rpts, columns=["id", "lon", "lat"])
    )
    k = 6
    got = {}
    for r in knn_join_frames(spark, ldf, rdf, k).collect():
        got.setdefault(r.id, []).append((r.rank, r.id_right))
    exp = _knn_oracle(queries, rpts, k)
    for qid in exp:
        assert sorted(got[qid]) == exp[qid], qid
