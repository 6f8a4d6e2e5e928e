"""Deduplication operators (exact, shingle-Jaccard, MinHash-LSH, SimHash).

Scale design notes:
* exact dedup = hash-groupBy on a normalized key — one shuffle, map-side
  partial aggregation free from Catalyst;
* shingle-Jaccard = inverted-index self-join on shingles (explode → equi-join
  → integer pair-count), the exact-but-distributed algorithm — candidate set
  is only pairs sharing ≥1 shingle;
* MinHash-LSH = signature matrix via numpy (Arrow-batched), banding →
  candidate pairs via equi-join on (band, bucket), then **exact Jaccard
  verify** so emitted pairs are true positives only;
* SimHash = 64-bit token-weighted hash; near-dup = hamming ≤ r via
  bit-block banding (pigeonhole: hamming ≤ r ⇒ some block of r+1 equal).
All hashes are our own deterministic numpy implementations (no reliance on
python's randomized ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# ------------------------------------------------------------ exact dedup --


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Map every doc to the canonical (min-id) doc with the same key.

    ``normalize=True`` keys on the sorted distinct token set (order/multiplicity
    insensitive — catches shuffled bag-of-words duplicates)."""
    key = (
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))), " ")
        if normalize
        else F.col(text_col)
    )
    keyed = df.select(F.col(id_col), key.alias("dedup_key"))
    canon = keyed.groupBy("dedup_key").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return keyed.join(canon, "dedup_key").select(id_col, "canonical_id", "group_size")


# ------------------------------------------------------- shingles / jaccard --


def shingle_df(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) rows — distinct word n-grams per doc, pure Catalyst:
    transform over token indices, then explode."""
    # materialise the token array once — referencing F.split(...) inside the
    # transform lambda would re-split the text per element access (O(n²))
    base = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def jaccard_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs via inverted-index self-join.

    Jaccard ≥ num/den decided in integer arithmetic (den·|∩| ≥ num·|∪|) —
    no float, bit-exact vs any oracle.  Output: (id_a, id_b, inter, uni),
    id_a < id_b."""
    sh = shingle_df(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.col("inter") * threshold_den >= F.col("uni") * threshold_num)
        .select("id_a", "id_b", "inter", "uni")
    )
    return out


# ------------------------------------------------------------ minhash-lsh --

# 31-bit Mersenne prime: (a*h + b) products stay < 2^62 — exact universal
# hashing in uint64 with no overflow
_P31 = np.uint64((1 << 31) - 1)


def _minhash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P31), num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_P31), num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame, num_hashes: int = 128, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig array<long>) — MinHash over word n-gram shingles.

    Shingle hashing runs JVM-side (``xxhash64`` inside whole-stage codegen);
    the pandas UDF only does the vectorised (a·h+b) mod p min-reduction —
    no per-character Python anywhere."""
    a_params, b_params = _minhash_params(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            th = (np.asarray(arr, dtype=np.int64).astype(np.uint64)) & _P31
            hv = (a_params[None, :] * th[:, None] + b_params[None, :]) % _P31
            out.append(hv.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    sh = shingle_df(df, n, text_col, id_col)
    grouped = (
        sh.select(F.col(id_col), F.xxhash64("shingle").alias("h"))
        .groupBy(id_col)
        .agg(F.collect_list("h").alias("hs"))
    )
    return grouped.select(F.col(id_col), sig_udf(F.col("hs")).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with EXACT Jaccard.

    Emitted pairs are true positives (≥ threshold) — LSH only bounds recall.
    Output: (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(
                        *[F.element_at("sig", bi * rows_per_band + j + 1) for j in range(rows_per_band)]
                    ).alias("bucket"),
                )
                for bi in range(bands)
            ]
        )
    )
    banded = sigs.select(F.col(id_col), band_cols.alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    # exact verify: join shingle sets back on the candidate pairs
    sh = shingle_df(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    ia = sh.withColumnRenamed(id_col, "id_a")
    ib = sh.withColumnRenamed(id_col, "_rid").withColumnRenamed("shingle", "shingle_b")
    inter = (
        cand.join(ia, "id_a")
        .join(ib, (F.col("id_b") == F.col("_rid")) & (F.col("shingle") == F.col("shingle_b")), "inner")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni").cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- simhash --


@pandas_udf(LongType())
def simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from pre-hashed tokens (vectorised bit voting)."""
    out = np.empty(len(hashes), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    pow2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
    for i, arr in enumerate(hashes):
        th = np.asarray(arr, dtype=np.int64).astype(np.uint64)
        bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        v = (bits * 2 - 1).sum(axis=0)
        out[i] = np.int64((pow2[v > 0]).sum().astype(np.uint64))
    return pd.Series(out)


def simhash_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sh) — token hashing JVM-side (xxhash64), bit voting in numpy."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    hashed = df.select(F.col(id_col), toks).select(
        F.col(id_col), F.xxhash64("tok").alias("h")
    )
    grouped = hashed.groupBy(id_col).agg(F.collect_list("h").alias("hs"))
    return grouped.select(F.col(id_col), simhash_from_hashes(F.col("hs")).alias("sh"))


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ r via pigeonhole block join:
    split 64 bits into r+1 blocks; any pair within r shares ≥1 full block →
    equi-join per block, then exact popcount filter."""
    blocks = max_hamming + 1
    width = 64 // blocks
    h = simhash_df(df, text_col, id_col)
    parts = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("blk"),
                    F.shiftrightunsigned(F.col("sh"), bi * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for bi in range(blocks)
            ]
        )
    )
    banded = h.select(id_col, "sh", parts.alias("p")).select(
        id_col, "sh", F.col("p.blk").alias("blk"), F.col("p.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
