"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k, distributed: each partition
  computes its local top-k per query with one float64 numpy matmul
  (Arrow-batched ``mapInPandas``), then a narrow global merge ranks the
  union (global top-k ⊆ union of per-partition top-k ⇒ exact).
* ``lsh_topk`` — scale path: random-hyperplane LSH bucketing (signed
  projections, deterministic seed); candidates share a bucket in ≥1 table;
  exact re-rank of candidates.  Recall<1 by construction — the benchmark
  reports its recall vs brute force.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _collect_queries(df: DataFrame, query_ids: list[int], id_col: str, vec_col: str):
    q = df.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in q], dtype=np.int64)
    qm = np.array([r[1] for r in q], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    return qids, qm


def _exact_rerank(
    cand: DataFrame, qmap: dict, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Exact-cosine re-rank of (query_id, id, vec) candidate rows →
    top-k (query_id, vec_id, score, rank) with the deterministic
    (score desc, vec_id asc) tie-break — the shared tail of ``lsh_topk``,
    ``ivf_topk`` and ``ivf_pq_topk``, kept in ONE place so the zero-norm
    guard and tie-break cannot drift between the ANN variants."""
    spark = cand.sparkSession
    bq = spark.sparkContext.broadcast(qmap)

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm_l = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            qarr = np.array([qm_l[int(q)] for q in pdf["query_id"]])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype(np.int64),
                    "vec_id": pdf[id_col].astype(np.int64),
                    "score": (qarr * m).sum(axis=1),
                }
            )

    scored = cand.select("query_id", id_col, vec_col).mapInPandas(
        rerank, _TOPK_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbours for each query id.

    Output: (query_id, vec_id, score, rank), deterministic
    (score desc, vec_id asc) tie-break."""
    spark = df.sparkSession
    qids, qm = _collect_queries(df, query_ids, id_col, vec_col)
    bq = spark.sparkContext.broadcast((qids, qm))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_l, qm_l = bq.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            scores = qm_l @ m.T  # (nq, nrows)
            nq, nr = scores.shape
            kk = min(k + (0 if include_self else 1), nr)
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids_l, kk),
                "vec_id": ids[part].ravel(),
                "score": np.take_along_axis(scores, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    cand = df.select(id_col, vec_col).mapInPandas(local_topk, _TOPK_SCHEMA)
    if not include_self:
        cand = cand.filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add (table, bucket) rows per vector: sign pattern of random-hyperplane
    projections (one numpy matmul per Arrow batch)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    spark = df.sparkSession
    bp = spark.sparkContext.broadcast(planes)
    cols = df.columns

    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("table", LongType()), StructField("bucket", LongType())]
    )

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        pow2 = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            frames = []
            for t in range(n_tables):
                signs = (m @ pl[t].T) > 0
                buckets = (signs.astype(np.int64) * pow2).sum(axis=1)
                f = pdf[cols].copy()
                f["table"] = t
                f["bucket"] = buckets
                frames.append(f)
            yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(bucketize, out_schema)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidate
    generation (pairs sharing a bucket in ≥1 table) + exact float64 cosine
    verify — emitted pairs are true positives.  Output (id_a, id_b, cosine).
    """
    dim = len(df.select(vec_col).first()[0])
    bucketed = lsh_bucket_ids(df, dim, n_planes, n_tables, vec_col=vec_col)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{vec_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{vec_col}").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ma = np.array(pdf["vec_a"].tolist(), dtype=np.float64)
            mb = np.array(pdf["vec_b"].tolist(), dtype=np.float64)
            na = np.linalg.norm(ma, axis=1)
            nb = np.linalg.norm(mb, axis=1)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            cos = (ma * mb).sum(axis=1) / (na * nb)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].astype(np.int64),
                    "id_b": pdf["id_b"].astype(np.int64),
                    "cosine": cos,
                }
            )

    return cand.mapInPandas(verify, schema).filter(F.col("cosine") >= threshold)


def deterministic_planes(n_tables: int, n_planes: int, dim: int) -> list:
    """Hyperplane components from pure integer hashing — plain Python floats
    a SQL oracle can re-derive (or take as literals); no RNG state."""
    out = []
    m = 2000003  # prime modulus; component = 2*(k mod m)/m - 1 in [-1, 1)
    for t in range(n_tables):
        tbl = []
        for p in range(n_planes):
            row = []
            for d in range(dim):
                k = (t * 73856093 + p * 19349663 + d * 83492791 + 7) % m
                row.append(2.0 * (float(k) / float(m)) - 1.0)
            tbl.append(row)
        out.append(tbl)
    return out


def cosine_near_dup_pairs_exactfold(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``cosine_near_dup_pairs`` variant whose every float op is a
    SEQUENTIAL LEFT FOLD over the vector dimensions (a dim-indexed numpy
    loop — still vectorised across rows), with deterministic integer-hash
    planes.  An ANSI-SQL oracle (``list_sum`` over per-dimension products =
    the same left fold) reproduces candidates AND cosines bit-for-bit —
    this removes the r1 ``no_oracle`` row for emb_near_dup (VERDICT #8).
    """
    dim = len(df.select(vec_col).first()[0])
    planes = np.array(deterministic_planes(n_tables, n_planes, dim))
    spark = df.sparkSession
    bp = spark.sparkContext.broadcast(planes)
    cols = df.columns

    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("table", LongType()), StructField("bucket", LongType())]
    )

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        pow2 = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            frames = []
            for t in range(n_tables):
                dots = np.zeros((len(m), n_planes))
                for d in range(m.shape[1]):  # sequential fold over dims
                    dots = dots + m[:, d : d + 1] * pl[t][None, :, d]
                signs = dots > 0
                f = pdf[cols].copy()
                f["table"] = t
                f["bucket"] = (signs.astype(np.int64) * pow2).sum(axis=1)
                frames.append(f)
            yield pd.concat(frames, ignore_index=True)

    bucketed = df.mapInPandas(bucketize, out_schema)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{vec_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{vec_col}").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ma = np.array(pdf["vec_a"].tolist(), dtype=np.float64)
            mb = np.array(pdf["vec_b"].tolist(), dtype=np.float64)
            dot = np.zeros(len(ma))
            na2 = np.zeros(len(ma))
            nb2 = np.zeros(len(ma))
            for d in range(ma.shape[1]):  # sequential folds, SQL-identical
                dot = dot + ma[:, d] * mb[:, d]
                na2 = na2 + ma[:, d] * ma[:, d]
                nb2 = nb2 + mb[:, d] * mb[:, d]
            na = np.sqrt(na2)
            nb = np.sqrt(nb2)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].astype(np.int64),
                    "id_b": pdf["id_b"].astype(np.int64),
                    "cosine": dot / (na * nb),
                }
            )

    return cand.mapInPandas(verify, schema).filter(F.col("cosine") >= threshold)


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidates, exact cosine re-rank.
    Output schema matches ``cosine_topk``."""
    dim = len(df.select(vec_col).first()[0])
    bucketed = lsh_bucket_ids(df, dim, n_planes, n_tables, vec_col=vec_col)
    qb = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    cand = (
        bucketed.join(qb, ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col)
        .dropDuplicates(["query_id", id_col])
    )
    qids, qm = _collect_queries(df, query_ids, id_col, vec_col)
    qmap = {int(q): qm[i] for i, q in enumerate(qids)}
    return _exact_rerank(cand, qmap, k, id_col, vec_col)


# ----------------------------------------------------------------- IVF ANN --


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 32,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample — the IVF coarse
    quantizer.  Training is a driver-side numpy Lloyd loop over ≤``sample``
    vectors (hash-selected, order-independent); at 10^12 rows the sample is
    a fixed-size sketch, the expensive assignment stays distributed.
    The sample is ``_hash_sample_matrix`` — the SAME sketch
    ``train_pq_codebooks`` trains on (the IVFADC residual codebooks must
    see the vector set the coarse centroids were fit to)."""
    x = _hash_sample_matrix(df, sample, id_col, vec_col)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                cents[c] = v / nv if nv > 0 else cents[c]
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the nearest-centroid list id: one broadcast matmul per Arrow
    batch (the distributed half of IVF indexing — on a real cluster this
    is the ingest-time write of the ``list_id`` partition column).

    r6: the list id is appended IN the same mapInPandas pass-through
    instead of being joined back by id — the old shape shuffled the full
    embedding table through an id equi-join just to re-attach one small
    column its own rows produced (guide §2.4: remove shuffles outright).
    Output rows/columns are identical (df columns + list_id)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    cols = df.columns
    schema = StructType(
        [f for f in df.schema.fields] + [StructField("list_id", LongType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            out = pdf[cols].copy()
            out["list_id"] = np.argmax(m @ cents.T, axis=1).astype(np.int64)
            yield out

    return df.mapInPandas(assign, schema)


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search — the brief's
    named scale path next to LSH: vectors partition into ``n_centroids``
    coarse lists; each query scans only its ``nprobe`` nearest lists
    (candidate fraction ≈ nprobe/n_centroids of the table), exact cosine
    re-rank on the candidates.  Output schema matches ``cosine_topk``;
    recall<1 by construction — tests report recall vs brute force and
    verify every emitted score bit-exactly."""
    spark = df.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    assigned = ivf_assign(df, centroids, id_col, vec_col)

    qids, qm = _collect_queries(df, query_ids, id_col, vec_col)
    probes = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(q), int(c)) for i, q in enumerate(qids) for c in probes[i]
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, list_id long")

    cand = assigned.join(F.broadcast(probe_df), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    qmap = {int(q): qm[i] for i, q in enumerate(qids)}
    return _exact_rerank(cand, qmap, k, id_col, vec_col)


# -------------------------------------------------------------- IVF-PQ ANN --


def _hash_sample_matrix(
    df: DataFrame, sample: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Bounded, order-independent training sample: the ``sample`` rows with
    the smallest ``xxhash64(id) mod p`` (ties by id) — a fixed-size sketch
    whatever the table size, collected once to the driver."""
    frac_mod = F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003))
    rows = (
        df.select(id_col, vec_col, frac_mod.alias("_h"))
        .orderBy("_h", id_col)
        .limit(sample)
        .collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    return x / n[:, None]


def train_pq_codebooks(
    df: DataFrame,
    centroids: np.ndarray,
    m_sub: int = 8,
    n_codes: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks over coarse residuals (Jégou,
    Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
    IEEE TPAMI 2011 — the IVFADC layout).  Each normalized vector's
    residual against its nearest coarse centroid is split into ``m_sub``
    contiguous subvectors; a per-subspace Lloyd loop learns ``n_codes``
    centroids.  Driver-side on the same bounded hash-sample as
    ``train_ivf_centroids`` (a fixed-size sketch at any table size);
    returns float64 (m_sub, n_codes, dim // m_sub)."""
    x = _hash_sample_matrix(df, sample, id_col, vec_col)
    dim = x.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    res = x - centroids[np.argmax(x @ centroids.T, axis=1)]
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, min(n_codes, len(x)), dsub), dtype=np.float64)
    for m in range(m_sub):
        sub = res[:, m * dsub : (m + 1) * dsub]
        kc = books.shape[1]
        cents = sub[rng.choice(len(sub), size=kc, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kc):
                msk = assign == c
                if msk.any():
                    cents[c] = sub[msk].mean(axis=0)
        books[m] = cents
    return books


def pq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The compressed IVF-PQ index as a DataFrame: (id, list_id, codes).

    ``codes`` is ``m_sub`` small ints per vector (nearest codebook entry
    per residual subvector) — at 10^12 rows this table is the thing that
    gets scanned (m_sub bytes/row), NOT the raw float vectors; encoding
    is one broadcast-codebook numpy pass per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((centroids, codebooks))
    m_sub, _, dsub = codebooks.shape
    schema = StructType(
        [
            StructField("_pq_id", LongType()),
            StructField("list_id", LongType()),
            StructField("codes", ArrayType(LongType())),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, books = bc.value
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(v, axis=1)
            norms[norms == 0] = 1.0
            v = v / norms[:, None]
            lists = np.argmax(v @ cents.T, axis=1)
            res = v - cents[lists]
            codes = np.empty((len(v), m_sub), dtype=np.int64)
            for m in range(m_sub):
                sub = res[:, m * dsub : (m + 1) * dsub]
                # ||s - c||^2 = ||s||^2 - 2 s·c + ||c||^2 → argmin over c
                dots = sub @ books[m].T
                c2 = (books[m] ** 2).sum(axis=1)
                codes[:, m] = np.argmin(c2[None, :] - 2.0 * dots, axis=1)
            yield pd.DataFrame(
                {
                    "_pq_id": pdf[id_col].astype(np.int64),
                    "list_id": lists.astype(np.int64),
                    "codes": list(codes),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(encode, schema).withColumnRenamed(
        "_pq_id", id_col
    )


def ivf_pq_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (IVFADC) approximate top-k: probe ``nprobe`` coarse lists,
    score candidates from their PQ codes alone by asymmetric distance
    computation (per-query lookup tables, one ``LUT[m, code]`` gather —
    no raw vectors touched), shortlist the best ``rerank * k`` per query,
    then exact-cosine re-rank only the shortlist (one id-join back to the
    float vectors).  Output schema matches ``cosine_topk``.

    ADC inner product: with normalized query q, candidate ≈ c_list + r̂,
    q·v ≈ q·c_list + Σ_m q_m·book_m[code_m] — exact for the reconstruction,
    lossy only in r̂.  Setting nprobe == n_centroids and rerank*k ≥ n makes
    the shortlist the full table, so the result must equal brute force —
    the contract equality gate; recall at lossy settings is pytest-reported."""
    spark = df.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            df, centroids, m_sub=m_sub, n_codes=n_codes, id_col=id_col, vec_col=vec_col
        )
    m_dims, _, dsub = codebooks.shape
    encoded = pq_encode(df, centroids, codebooks, id_col, vec_col)

    qids, qm = _collect_queries(df, query_ids, id_col, vec_col)
    probes = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    probe_df = spark.createDataFrame(
        [(int(q), int(c)) for i, q in enumerate(qids) for c in probes[i]],
        "query_id long, list_id long",
    )
    cand = encoded.join(F.broadcast(probe_df), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )

    # Per-query ADC tables: luts[q] (m_sub, n_codes) = q_m · book_m[j];
    # coarse[q] (n_centroids,) = q · c.  Broadcast once, gathered per batch.
    luts = {
        int(q): np.stack(
            [qm[i, m * dsub : (m + 1) * dsub] @ codebooks[m].T for m in range(m_dims)]
        )
        for i, q in enumerate(qids)
    }
    coarse = {int(q): qm[i] @ centroids.T for i, q in enumerate(qids)}
    badc = spark.sparkContext.broadcast((luts, coarse))

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        luts_l, coarse_l = badc.value
        marange = np.arange(m_dims)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            lists = pdf["list_id"].to_numpy(dtype=np.int64)
            out = np.empty(len(pdf), dtype=np.float64)
            for q, idx in pdf.groupby("query_id").indices.items():
                lut = luts_l[int(q)]
                out[idx] = lut[marange[None, :], codes[idx]].sum(axis=1)
                out[idx] += coarse_l[int(q)][lists[idx]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype(np.int64),
                    "vec_id": pdf[id_col].astype(np.int64),
                    "score": out,
                }
            )

    approx = cand.select("query_id", id_col, "list_id", "codes").mapInPandas(
        adc, _TOPK_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank * k)
        .select("query_id", "vec_id")
    )
    # the shortlist is provably tiny (≤ rerank·k rows per query) — an
    # explicit broadcast keeps the float-vector table un-shuffled at any
    # scale (guide §3.1: hint when a side is known small)
    rer = F.broadcast(shortlist).join(
        df.select(F.col(id_col).alias("vec_id"), vec_col), "vec_id"
    ).select("query_id", F.col("vec_id").alias(id_col), vec_col)
    qmap = {int(q): qm[i] for i, q in enumerate(qids)}
    return _exact_rerank(rer, qmap, k, id_col, vec_col)
