import numpy as np
import pytest

from jena_geo_spark.image import codec


def test_raw_roundtrip():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert (codec.decode_raw(codec.encode_raw(arr), 16, 16) == arr).all()


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(2)
    for w, h in [(5, 5), (8, 16), (32, 32)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = codec.decode_png(codec.encode_png(arr))
        assert (out == arr).all()


def test_png_filters_decode():
    """Decoder handles all five PNG filter types (re-encode rows with each
    filter, round-trip must be exact)."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    h, w, _ = arr.shape
    # hand-build a PNG using filter 2 (Up) on every row
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        rows.append(b"\x02" + ((line.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        codec._PNG_SIG
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + codec._chunk(b"IEND", b"")
    )
    assert (codec.decode_png(png) == arr).all()


def test_decode_dispatch_and_jpg():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert (codec.decode(codec.encode_raw(arr), 8, 8, "raw") == arr).all()
    # jpg dispatches to the real baseline codec (lossy round trip)
    from jena_geo_spark.image.jpeg import encode_jpeg

    dec = codec.decode(encode_jpeg(arr, quality=95), 8, 8, "jpg")
    assert dec.shape == arr.shape and dec.dtype == np.uint8
    with pytest.raises(ValueError):
        codec.decode(b"not a jpeg", 8, 8, "jpg")


def test_phash_deterministic_and_sensitive():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert codec.phash64(a) == codec.phash64(a.copy())
    b = a.copy()
    b[:16] = 255 - b[:16]
    assert codec.phash64(a) != codec.phash64(b)
    # small noise keeps hash close (perceptual property)
    c = np.clip(a.astype(np.int16) + rng.integers(-4, 5, a.shape), 0, 255).astype(np.uint8)
    ham = bin(codec.phash64(a) ^ codec.phash64(c)).count("1")
    assert ham <= 12


def test_psnr_gate():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert codec.psnr(a, a) == float("inf")
    noisy = np.clip(a.astype(np.int16) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    assert codec.psnr(a, noisy) >= 40.0  # the lossy-path acceptance gate


def test_composite_codes_no_aliasing():
    # w/h beyond 16 bits or >15 formats must fall back to exact multi-col
    # factorization instead of aliasing packed keys (ADVICE r2 #5)
    import numpy as np

    from jena_geo_spark.image.spark import _composite_codes

    b = np.zeros(2, dtype=np.int64)
    w = np.array([8, 8 + 65536], dtype=np.int64)
    h = np.array([8, 8], dtype=np.int64)
    f = np.zeros(2, dtype=np.int64)
    codes = _composite_codes(b, w, h, f)
    assert codes[0] != codes[1]

    n = 20  # > 15 distinct fmt codes
    b = np.zeros(n, dtype=np.int64)
    w = np.full(n, 8, dtype=np.int64)
    h = np.full(n, 8, dtype=np.int64)
    f = np.arange(n, dtype=np.int64)
    assert len(set(_composite_codes(b, w, h, f).tolist())) == n

    # fast path: identical composites share a code, distinct ones don't
    b = np.array([0, 0, 1], dtype=np.int64)
    w = np.array([8, 8, 8], dtype=np.int64)
    h = np.array([8, 8, 8], dtype=np.int64)
    f = np.array([0, 0, 0], dtype=np.int64)
    codes = _composite_codes(b, w, h, f)
    assert codes[0] == codes[1] != codes[2]
