"""Image resize + video frame-sample plumbing (image/resize.py).

Kernel properties that pin the bilinear resampler, then the Spark
stages: schema, caption/id passthrough, recomputed-phash verify gate,
NULL tolerance, and the injectable-decoder frame explode."""

import numpy as np
import pytest

from jena_geo_spark.image import codec
from jena_geo_spark.image.resize import (
    fit_within,
    resize_bilinear,
    resize_images,
    sample_frames,
)


# ---------------------------------------------------------------- kernels --


def test_resize_identity_is_exact():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(arr, 17, 23), arr)


def test_resize_constant_image_stays_constant():
    arr = np.full((40, 60, 3), 137, dtype=np.uint8)
    out = resize_bilinear(arr, 13, 29)
    assert out.shape == (13, 29, 3) and (out == 137).all()


def test_resize_half_equals_2x2_box_average():
    """With half-pixel centers, an exact 2× downscale lands every sample
    at the center of a 2×2 block — bilinear == box average there."""
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = resize_bilinear(arr, 8, 8)
    box = arr.astype(np.float64).reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))
    assert np.abs(out.astype(np.float64) - box).max() <= 1.0  # ±1 LSB rounding


def test_resize_preserves_horizontal_gradient_monotonicity():
    grad = np.tile(np.arange(64, dtype=np.uint8)[None, :, None] * 4, (8, 1, 3))
    out = resize_bilinear(grad, 8, 16)
    row = out[4, :, 0].astype(int)
    assert (np.diff(row) >= 0).all() and row[0] < row[-1]


def test_resize_upscale_shape_and_range():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = resize_bilinear(arr, 50, 70)
    assert out.shape == (50, 70, 3)
    assert out.min() >= arr.min() and out.max() <= arr.max()  # convex blends


def test_fit_within():
    assert fit_within(100, 50, 64) == (64, 32)
    assert fit_within(50, 100, 64) == (32, 64)
    assert fit_within(30, 20, 64) == (30, 20)  # never upscale
    assert fit_within(2000, 1, 64) == (64, 1)  # never round to 0


# ------------------------------------------------------------ Spark stages --


def _images_df(spark, n=12, w=40, h=28):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = ["raw", "png", "jpg"][i % 3]
        if fmt == "raw":
            payload = codec.encode_raw(arr)
        elif fmt == "png":
            payload = codec.encode_png(arr)
        else:
            from jena_geo_spark.image import jpeg

            payload = jpeg.encode_jpeg(arr, quality=90)
            arr = jpeg.decode_jpeg(payload)
        rows.append(
            (f"img_{i}", payload, w, h, fmt, f"caption {i}", codec.phash64(arr))
        )
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )


def test_resize_images_schema_metadata_and_verify_gate(spark):
    from jena_geo_spark.image.spark import with_phash_verified

    df = _images_df(spark)
    out = resize_images(df, max_side=16, out_fmt="png")
    rows = {r.image_id: r for r in out.collect()}
    assert len(rows) == 12
    for i in range(12):
        r = rows[f"img_{i}"]
        assert (r.w, r.h) == (16, 11) and r.fmt == "png"
        assert r.caption == f"caption {i}"  # caption equality through the stage
        dec = codec.decode_png(bytes(r.bytes))
        assert dec.shape == (11, 16, 3)
        assert r.phash == codec.phash64(dec)  # stored phash is the real one
    # the output table passes the north-rule verify gate end-to-end
    ok = with_phash_verified(out).select("phash_ok").collect()
    assert all(r.phash_ok for r in ok)


def test_resize_images_jpg_roundtrip_psnr(spark):
    from jena_geo_spark.image import jpeg

    df = _images_df(spark, n=3)
    out = {r.image_id: r for r in resize_images(df, 16, out_fmt="jpg").collect()}
    src = {r.image_id: r for r in df.collect()}
    for key, r in out.items():
        assert r.fmt == "jpg"
        dec = jpeg.decode_jpeg(bytes(r.bytes))
        s = src[key]
        ref = resize_bilinear(
            codec.decode(bytes(s.bytes), s.w, s.h, s.fmt), r.h, r.w
        )
        # random-noise payloads are JPEG's worst case (~30 dB at q90);
        # 25 dB still gates a real decode→resize→encode round trip
        assert codec.psnr(dec, ref) >= 25.0
        assert r.phash == codec.phash64(dec)  # phash describes the LOSSY payload


def test_resize_images_never_upscales_but_transcodes(spark):
    df = _images_df(spark, n=3, w=10, h=8)
    out = resize_images(df, max_side=64, out_fmt="raw").collect()
    for r in out:
        assert (r.w, r.h) == (10, 8) and r.fmt == "raw"
        assert len(bytes(r.bytes)) == 10 * 8 * 3


def test_resize_images_bad_rows_pass_through_null(spark):
    df = _images_df(spark, n=2).unionByName(
        _images_df(spark, n=1).selectExpr(
            "concat('bad_', image_id) AS image_id",
            "cast('nonsense' as binary) AS bytes",
            "w", "h", "'png' AS fmt", "caption", "phash",
        )
    )
    rows = {r.image_id: r for r in resize_images(df, 16).collect()}
    bad = rows["bad_img_0"]
    assert bad.bytes is None and bad.phash is None
    # failed rows keep their ORIGINAL metadata so the failure is
    # self-describing (retryable), not stamped with the target fmt/dims
    assert (bad.w, bad.h, bad.fmt) == (40, 28, "png")
    assert rows["img_0"].bytes is not None  # good rows unaffected
    assert (rows["img_0"].w, rows["img_0"].h) == (16, 11)


def test_sample_frames_default_decoder_is_stub(spark):
    df = _images_df(spark, n=1)
    with pytest.raises(Exception, match="video codec"):
        sample_frames(df).collect()


def test_sample_frames_rejects_non_uint8_decoder(spark):
    """A decoder returning normalized float frames must fail LOUDLY —
    casting it to uint8 would silently emit near-black garbage."""

    def float_decoder(data: bytes, w: int, h: int) -> np.ndarray:
        return np.random.default_rng(0).random((4, h, w, 3), dtype=np.float32)

    df = _images_df(spark, n=1, w=6, h=4)
    with pytest.raises(Exception, match="uint8"):
        sample_frames(df, decoder=float_decoder).collect()


def test_sample_frames_fake_decoder_explode_shape(spark):
    def fake_decoder(data: bytes, w: int, h: int) -> np.ndarray:
        # deterministic "video": frame f = payload-seeded constant + f
        seed = int.from_bytes(bytes(data)[:4].ljust(4, b"\0"), "big") % 200
        n = 25
        base = np.full((n, h, w, 3), seed, dtype=np.uint16)
        base += np.arange(n, dtype=np.uint16)[:, None, None, None]
        return (base % 256).astype(np.uint8)

    df = _images_df(spark, n=4, w=6, h=4)
    out = sample_frames(df, every_n=10, max_frames=2, decoder=fake_decoder)
    rows = out.orderBy("image_id", "frame_idx").collect()
    # 4 videos × frames {0, 10} — the explode shape
    assert [(r.image_id, r.frame_idx) for r in rows] == [
        (f"img_{i}", f) for i in range(4) for f in (0, 10)
    ]
    caps = {r.image_id for r in rows if r.caption.startswith("caption ")}
    assert len(caps) == 4  # caption carried onto every frame row
    for r in rows:
        f = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8).reshape(
            r.h, r.w, 3
        )
        assert (r.w, r.h) == (6, 4)
        # frame content matches the injected decoder deterministically
        seed = (f[0, 0, 0] - r.frame_idx) % 256
        assert (f == (seed + r.frame_idx) % 256).all()
