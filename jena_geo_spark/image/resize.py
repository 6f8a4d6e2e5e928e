"""Image resize / video frame-sample plumbing (pure numpy kernels +
Spark ``mapInPandas`` stages over the BASELINE input_hint schema
``(image_id, bytes, w, h, fmt, caption, phash)``).

``resize_bilinear`` is a REAL vectorized bilinear resampler (no PIL in
this environment; the PNG/JPEG codecs in image/codec.py + image/jpeg.py
decode for real).  Convention: half-pixel source centers,
``src = (dst + 0.5) * scale - 0.5`` clamped to the edge — the
align_corners=False convention used by OpenCV ``INTER_LINEAR`` and
torchvision, so downstream consumers get the mainstream geometry.

Video payloads have no decoder in this container: ``sample_frames``
keeps the Spark-side plumbing real (schema, explode shape, batch
vectorization, deterministic frame selection) and takes the decoder as
an injectable callable; the default raises ``NotImplementedError`` as
the brief mandates, and tests inject a deterministic fake.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec


# ---------------------------------------------------------------- kernels --


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8 → (out_h, out_w, c) uint8, separable bilinear.

    Fully vectorized: gather the 4 neighbour planes with integer index
    arrays and blend with the fractional weights — no per-pixel Python.
    Rounding is round-half-up via ``+0.5`` truncation on the float blend
    (matches the common fixed-point implementations within ±1 LSB)."""
    h, w = arr.shape[:2]
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output dims must be positive")
    if (out_h, out_w) == (h, w):
        return np.ascontiguousarray(arr, dtype=np.uint8)
    sy = h / out_h
    sx = w / out_w
    fy = np.clip((np.arange(out_h) + 0.5) * sy - 0.5, 0.0, h - 1.0)
    fx = np.clip((np.arange(out_w) + 0.5) * sx - 0.5, 0.0, w - 1.0)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    # gather only the four (out_h, out_w, c) corner planes — never a
    # float64 copy of the full source or an (out_h, w, c) row slice
    ia = arr[y0[:, None], x0[None, :]].astype(np.float64)
    ib = arr[y0[:, None], x1[None, :]].astype(np.float64)
    ic = arr[y1[:, None], x0[None, :]].astype(np.float64)
    id_ = arr[y1[:, None], x1[None, :]].astype(np.float64)
    top = ia * (1.0 - wx) + ib * wx
    bot = ic * (1.0 - wx) + id_ * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(out + 0.5, 0.0, 255.0).astype(np.uint8)


def fit_within(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving (w, h) with the longer side == max_side (never
    upscales; a dimension never rounds below 1)."""
    longest = max(w, h)
    if longest <= max_side:
        return w, h
    return max(1, round(w * max_side / longest)), max(
        1, round(h * max_side / longest)
    )


# ------------------------------------------------------------ Spark stages --

_RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


def resize_images(
    df: DataFrame, max_side: int, out_fmt: str = "png", jpeg_quality: int = 90
) -> DataFrame:
    """Decode → aspect-fit resize → re-encode, one ``mapInPandas`` stage.

    Input/output schema is the BASELINE input_hint row
    ``(image_id, bytes, w, h, fmt, caption, phash)``; the output row
    carries the resized payload in ``out_fmt`` ('png' | 'raw' | 'jpg'),
    updated (w, h, fmt) and the phash RECOMPUTED from the resized pixels,
    so the verify gate (image/spark.with_phash_verified) holds on the
    output table too.  Caption and image_id pass through untouched
    (caption equality through every stage is the north-rule invariant).
    Rows that fail to decode pass through with NULL bytes/phash and
    their ORIGINAL (w, h, fmt) — the metadata needed to retry or inspect
    the failure — rather than killing the batch.  Already-small images
    are NOT upscaled but are still transcoded to ``out_fmt``."""
    if out_fmt not in ("png", "raw", "jpg"):
        raise ValueError(f"unknown out_fmt {out_fmt}")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out_b: list = [None] * n
            out_w = np.zeros(n, dtype=np.int64)
            out_h = np.zeros(n, dtype=np.int64)
            out_ph: list = [None] * n
            bs = pdf["bytes"].tolist()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            fmts = pdf["fmt"].tolist()
            # Factorize on (payload, w, h, fmt): each distinct image is
            # decoded/resized/re-encoded ONCE per Arrow batch (the same
            # contract as the phash verify path — synthetic and scraped
            # corpora pool payloads via parquet dictionary encoding;
            # unique-payload data degenerates to one cache miss per row).
            cache: dict = {}
            planes: list = []
            new_keys: list = []
            for i in range(n):
                key = (bs[i], int(ws[i]), int(hs[i]), fmts[i])
                if key in cache:
                    continue
                try:
                    arr = codec.decode(bs[i], int(ws[i]), int(hs[i]), fmts[i])
                except Exception:
                    cache[key] = None
                    continue
                nw, nh = fit_within(arr.shape[1], arr.shape[0], max_side)
                arr = resize_bilinear(arr, nh, nw)
                if out_fmt == "png":
                    payload = codec.encode_png(arr)
                elif out_fmt == "raw":
                    payload = codec.encode_raw(arr)
                else:
                    from . import jpeg

                    payload = jpeg.encode_jpeg(arr, quality=jpeg_quality)
                    # the stored phash must describe the lossy payload
                    arr = jpeg.decode_jpeg(payload)
                cache[key] = [payload, arr.shape[1], arr.shape[0], None]
                planes.append(codec.gray32(arr))
                new_keys.append(key)
            if new_keys:
                hashes = codec.phash64_batch(np.stack(planes))
                for j, key in enumerate(new_keys):
                    cache[key][3] = int(hashes[j])
            for i in range(n):
                hit = cache[(bs[i], int(ws[i]), int(hs[i]), fmts[i])]
                if hit is not None:
                    out_b[i], out_w[i], out_h[i], out_ph[i] = hit
            decoded = [b is not None for b in out_b]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": out_b,
                    "w": pd.array(
                        [
                            int(out_w[i]) if decoded[i] else int(ws[i])
                            for i in range(n)
                        ],
                        dtype="Int32",
                    ),
                    "h": pd.array(
                        [
                            int(out_h[i]) if decoded[i] else int(hs[i])
                            for i in range(n)
                        ],
                        dtype="Int32",
                    ),
                    # failed rows keep their INPUT fmt (self-describing)
                    "fmt": [
                        out_fmt if decoded[i] else fmts[i] for i in range(n)
                    ],
                    "caption": pdf["caption"],
                    "phash": pd.array(out_ph, dtype="Int64"),
                }
            )

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return df.select(*cols).mapInPandas(work, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("caption", StringType()),
    ]
)


def _no_video_decoder(data: bytes, w: int, h: int) -> np.ndarray:
    raise NotImplementedError(
        "no video codec library is available in this container; inject a "
        "decoder(bytes, w, h) -> (n_frames, h, w, 3) uint8 array"
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    decoder: Callable[[bytes, int, int], np.ndarray] = _no_video_decoder,
) -> DataFrame:
    """Video frame sampling: one input row (opaque video ``bytes``) →
    ≤ ``max_frames`` output rows, frames ``0, every_n, 2·every_n, …``.

    The Spark plumbing is real (explode shape, raw-RGB frame payloads,
    caption carried to every frame row, deterministic ordering by
    (image_id, frame_idx)); the DECODE step is the injectable — the
    container ships no video codec, so the default decoder raises
    ``NotImplementedError`` (brief: stub the decode, make the plumbing
    real).  ``decoder(bytes, w, h)`` must return (n_frames, h, w, 3)
    uint8; tests inject a deterministic fake."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "image_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "w": [],
                "h": [],
                "caption": [],
            }
            for r in pdf.itertuples(index=False):
                frames = np.asarray(decoder(r.bytes, int(r.w), int(r.h)))
                # validate BEFORE any cast: silently uint8-casting a
                # float-frame decoder would emit garbage payloads
                if (
                    frames.dtype != np.uint8
                    or frames.ndim != 4
                    or frames.shape[3] != 3
                ):
                    raise ValueError("decoder must return (n, h, w, 3) uint8")
                idxs = np.arange(0, len(frames), every_n)[:max_frames]
                for i in idxs:
                    f = frames[i]
                    rows["image_id"].append(r.image_id)
                    rows["frame_idx"].append(int(i))
                    rows["frame_bytes"].append(codec.encode_raw(f))
                    rows["w"].append(f.shape[1])
                    rows["h"].append(f.shape[0])
                    rows["caption"].append(r.caption)
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "w", "h", "caption"]
    return df.select(*cols).mapInPandas(work, _FRAME_SCHEMA)
