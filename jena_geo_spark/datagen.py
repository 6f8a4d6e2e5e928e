"""Deterministic synthetic ``images`` + ``zones`` tables (FIXTURES.md §1-2).

Seeded (seed=42), no external data.  Point geometry mixture: uniform world +
zipfian hot clusters centred on the reference test-polygon area
(≈8.28 E, 49.99 N — ``owl/testdata.ttl`` poi/house fixtures) to exercise
skew/salting.  Written once per scale factor under ``data/sf{sf}/`` and
reused (pyarrow writer — fast, no Spark needed for generation).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import grid
from .geom import wkt as W
from .image import codec

SEED = 42
INGEST_FINE_RES = 24  # keep in sync with operators.spatial_join.FINE_RES

# cluster centres: first = the jena-geo test area; rest seeded world cities-ish
CLUSTERS = [
    (8.2835, 49.9928, 0.05),
    (77.29, 29.07, 0.5),
    (-74.0, 40.7, 0.3),
    (139.7, 35.7, 0.3),
    (2.35, 48.85, 0.2),
]

ADJ = ["quiet", "bright", "old", "green", "busy", "small", "grand", "red"]
NOUN = ["house", "road", "bridge", "tower", "field", "market", "pier", "park"]


def n_images_for_sf(sf: float) -> int:
    return max(200, int(2_000_000 * sf))


def gen_points(n: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """60% clustered (zipf over clusters, gaussian spread), 40% uniform."""
    n_cluster = int(n * 0.6)
    weights = 1.0 / np.arange(1, len(CLUSTERS) + 1) ** 1.2
    weights /= weights.sum()
    which = rng.choice(len(CLUSTERS), size=n_cluster, p=weights)
    cx = np.array([c[0] for c in CLUSTERS])[which]
    cy = np.array([c[1] for c in CLUSTERS])[which]
    cs = np.array([c[2] for c in CLUSTERS])[which]
    lon_c = cx + rng.normal(0, cs)
    lat_c = cy + rng.normal(0, cs)
    lon_u = rng.uniform(-180, 180, n - n_cluster)
    lat_u = rng.uniform(-85, 85, n - n_cluster)
    lon = np.clip(np.concatenate([lon_c, lon_u]), -179.999, 179.999)
    lat = np.clip(np.concatenate([lat_c, lat_u]), -84.999, 84.999)
    # permute: real tables aren't sorted by cluster — leaving the clustered
    # block first would concentrate join matches in a few scan partitions
    # (map-side skew no shuffle boundary can rebalance)
    perm = rng.permutation(n)
    return lon[perm], lat[perm]


_DCTS: dict[int, np.ndarray] = {}


def _lowpass(arr: np.ndarray) -> np.ndarray:
    """DCT-truncate a random uint8 image to its lowest-quarter frequencies.

    jpg pool entries use this so the lossy payload satisfies the BASELINE
    PSNR ≥ 40 dB per-row invariant at quality 95 (full-spectrum noise
    cannot — the quantizer floors high-frequency energy).  Pure transform
    of the already-drawn array: consumes NO rng draws, so the generator's
    random stream (and thus every geometry/caption/idx downstream) is
    byte-identical to the pre-jpg datasets."""
    a = arr.astype(np.float64)
    h, w, _ = a.shape
    for n in (h, w):
        if n not in _DCTS:
            _DCTS[n] = codec._dct_matrix(n)
    dh, dw = _DCTS[h], _DCTS[w]
    kh, kw = max(1, h // 4), max(1, w // 4)
    out = np.empty_like(a)
    for c in range(3):
        co = dh @ a[..., c] @ dw.T
        co[kh:, :] = 0.0
        co[:, kw:] = 0.0
        out[..., c] = dh.T @ co @ dw
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def make_image(rng: np.random.Generator, i: int) -> tuple[bytes, int, int, str, int]:
    from .image import jpeg

    w = int(rng.choice([5, 8, 16]))
    h = w
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fmt = "png" if i % 5 == 0 else ("jpg" if i % 5 == 2 else "raw")
    if fmt == "jpg":
        src = _lowpass(arr)
        data = jpeg.encode_jpeg(src, quality=95)
        decoded = jpeg.decode_jpeg(data)
        # stored phash = phash of the DECODED pixels (what the verify
        # stage recomputes); generation enforces the lossy invariant
        p = codec.psnr(src, decoded)
        assert p >= 40.0, f"jpg pool image PSNR {p:.2f} < 40 dB"
        return data, w, h, fmt, codec.phash64(decoded)
    data = codec.encode_png(arr) if fmt == "png" else codec.encode_raw(arr)
    return data, w, h, fmt, codec.phash64(arr)


def build_images(n: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    lon, lat = gen_points(n, rng)
    # small pool of distinct images reused across rows (payload dedup at
    # generation keeps datagen O(n) cheap; ids/captions/geoms stay unique)
    pool = [make_image(rng, i) for i in range(min(n, 256))]
    idx = rng.integers(0, len(pool), n)
    adj = rng.integers(0, len(ADJ), n)
    noun = rng.integers(0, len(NOUN), n)
    image_id = [f"img_{i:012d}" for i in range(n)]
    captions = [
        f"caption for img {i}: {ADJ[adj[i]]} {NOUN[noun[i]]} near ({lon[i]:.4f},{lat[i]:.4f})"
        for i in range(n)
    ]
    geom_wkt = [f"POINT ({lon[i]!r} {lat[i]!r})" for i in range(n)]
    return pa.table(
        {
            "image_id": pa.array(image_id, pa.string()),
            "bytes": pa.array([pool[j][0] for j in idx], pa.binary()),
            "w": pa.array([pool[j][1] for j in idx], pa.int32()),
            "h": pa.array([pool[j][2] for j in idx], pa.int32()),
            "fmt": pa.array([pool[j][3] for j in idx], pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array([pool[j][4] for j in idx], pa.int64()),
            "geom_wkt": pa.array(geom_wkt, pa.string()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "srid": pa.array(np.full(n, 4326, dtype=np.int32), pa.int32()),
            # ingest-time materialised index column (engine-derived, see
            # FIXTURES.md §1): joins/kNN/tiling become UDF-free Catalyst
            "cell_fine": pa.array(
                grid.encode_points(lon, lat, INGEST_FINE_RES), pa.int64()
            ),
        }
    )


def build_zones(n_zones: int = 12, seed: int = SEED) -> pa.Table:
    """Zone polygons: the reference test geometries (scaled variants) +
    seeded convex polygons around cluster centres."""
    rng = np.random.default_rng(seed + 1)
    zones: list[tuple[str, str]] = []
    # reference house polygon (owl/testdata.ttl house_1_geom) — verbatim
    zones.append(
        (
            "zone_house_1",
            "POLYGON((8.286131571192028 49.993592741787,8.28627775158334 "
            "49.99350049055274,8.286228130716564 49.993466866227074,"
            "8.286079268116238 49.99355739320413,8.286131571192028 "
            "49.993592741787))",
        )
    )
    k = 0
    while len(zones) < n_zones:
        cx, cy, cs = CLUSTERS[k % len(CLUSTERS)]
        r = cs * rng.uniform(1.0, 4.0)
        m = int(rng.integers(5, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        ring = np.column_stack(
            [cx + np.cos(ang) * r * rng.uniform(0.6, 1.0, m), cy + np.sin(ang) * r * rng.uniform(0.6, 1.0, m)]
        )
        ring = np.vstack([ring, ring[:1]])
        zones.append((f"zone_{len(zones):03d}", W.to_wkt(W.Geom("polygon", [ring]))))
        k += 1
    return pa.table(
        {
            "zone_id": pa.array([z[0] for z in zones], pa.string()),
            "geom_wkt": pa.array([z[1] for z in zones], pa.string()),
            "srid": pa.array([4326] * len(zones), pa.int32()),
        }
    )


def ensure_dataset(sf: float, base_dir: str = "/root/repo/data") -> str:
    """Generate (once) and return the directory holding images/zones parquet."""
    d = os.path.join(base_dir, f"sf{sf}")
    img_p = os.path.join(d, "images.parquet")
    zone_p = os.path.join(d, "zones.parquet")
    if not (os.path.exists(img_p) and os.path.exists(zone_p)):
        os.makedirs(d, exist_ok=True)
        # small row groups keep a single file splittable into enough input
        # partitions to feed every core (Spark assigns row groups by byte
        # range); production tables would be many files and need none of this
        pq.write_table(build_images(n_images_for_sf(sf)), img_p, row_group_size=16384)
        pq.write_table(build_zones(), zone_p)
    return d


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else 0.01
