"""Spark-side image-payload stages (decode / verify / feature plumbing).

BASELINE per-row invariant: decoded-pixel allclose (PSNR ≥ 40 dB lossy) +
caption equality through every shuffle.  ``with_phash_verified`` recomputes
the perceptual hash from the decoded pixels and compares with the stored
``phash`` column — the operational form of that invariant inside a Spark
plan (Arrow-batched; per-row numpy decode + 32×32 DCT).

``fmt='jpg'`` rows are passed through as NULL (codec stubbed in this
container — see image/codec.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, LongType

from . import codec


@pandas_udf(BooleanType())
def phash_matches(b: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series, ph: pd.Series) -> pd.Series:
    out = np.empty(len(b), dtype=object)
    for i, (bb, ww, hh, f, p) in enumerate(
        zip(b.tolist(), w.tolist(), h.tolist(), fmt.tolist(), ph.tolist())
    ):
        if f == "jpg":
            out[i] = None
            continue
        arr = codec.decode(bytes(bb), int(ww), int(hh), f)
        out[i] = codec.phash64(arr) == int(p)
    return pd.Series(out)


@pandas_udf(LongType())
def recompute_phash(b: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
    out = np.zeros(len(b), dtype=np.int64)
    for i in range(len(b)):
        f = fmt.iloc[i]
        if f == "jpg":
            continue
        arr = codec.decode(bytes(b.iloc[i]), int(w.iloc[i]), int(h.iloc[i]), f)
        out[i] = codec.phash64(arr)
    return pd.Series(out)


def with_phash_verified(df: DataFrame, out_col: str = "phash_ok") -> DataFrame:
    return df.withColumn(
        out_col,
        phash_matches(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"), F.col("phash")),
    )


def decode_feature_stats(df: DataFrame) -> DataFrame:
    """Per-image pixel stats (mean/std per channel) — the decode/
    feature-extract plumbing for multimodal pipelines (schema + batch shape
    real; swap the kernel for a model embedding on a real cluster)."""

    schema = "image_id string, mean_r double, mean_g double, mean_b double, std double"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["fmt"] == "jpg":
                    rows.append((row["image_id"], None, None, None, None))
                    continue
                arr = codec.decode(bytes(row["bytes"]), int(row["w"]), int(row["h"]), row["fmt"])
                m = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (row["image_id"], float(m[0]), float(m[1]), float(m[2]), float(arr.std()))
                )
            yield pd.DataFrame(rows, columns=["image_id", "mean_r", "mean_g", "mean_b", "std"])

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(stats, schema)
