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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .text import _FP_BASE1, _FP_BASE2, _FP_P


def arith_hash31_col(s: Column) -> Column:
    """31-bit polynomial codepoint hash of a string column — pure Catalyst
    AND exactly reproducible in ANSI SQL (``list_reduce`` fold), unlike
    ``xxhash64``.  Used by the ``hash_fn='arith'`` variants so the driver's
    DuckDB oracle can replay the ENTIRE LSH pipeline bit-for-bit."""
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda acc, c: (acc * F.lit(_FP_BASE1) + c) % F.lit(_FP_P)
    )


def arith_hash62_col(s: Column) -> Column:
    """62-bit variant: two 31-bit folds (bases 257/263) packed h1<<31 | h2."""
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("bigint"))

    def fold(base: int) -> Column:
        return F.aggregate(
            codes, F.lit(0).cast("bigint"), lambda acc, c: (acc * F.lit(base) + c) % F.lit(_FP_P)
        )

    return fold(_FP_BASE1) * F.lit(1 << 31) + fold(_FP_BASE2)

# ------------------------------------------------------------ exact dedup --


def dedup_key_col(text: Column) -> Column:
    """The normalized exact-dedup key: the sorted distinct token set
    (order/multiplicity insensitive — catches shuffled bag-of-words
    duplicates).  Shared by ``exact_dedup`` and
    ``curate.curate_documents`` so their groupings can never diverge."""
    return F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Map every doc to the canonical (min-id) doc with the same key
    (``dedup_key_col`` when ``normalize=True``)."""
    key = dedup_key_col(F.col(text_col)) if normalize else F.col(text_col)
    keyed = df.select(F.col(id_col), key.alias("dedup_key"))
    canon = keyed.groupBy("dedup_key").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return keyed.join(canon, "dedup_key").select(id_col, "canonical_id", "group_size")


# ------------------------------------------------------- shingles / jaccard --


def _tok_grams(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, _grams) — the word-n-gram array per doc, built ONCE for every
    shingle consumer (``shingle_df`` and ``dup_spans`` must stay
    join-key-identical).
    The token array is materialised first — referencing F.split(...)
    inside the transform lambda would re-split the text per element
    access (O(n²)).

    r6: the source is widened when it arrives as fewer partitions than
    the cluster (single-row-group corpus file): without this the whole
    split+gram projection — the CPU-heavy part of every shingle
    consumer — serializes on one core before the first exchange.  All
    downstream shingle aggregations are integer counts / list-min
    reductions, so the changed row order cannot change any result."""
    from ..partitioning import widen_if_narrow

    base = widen_if_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    toks = F.col("_toks")
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return base.select(F.col(id_col), grams.alias("_grams"))


def shingle_df(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) rows — distinct word n-grams per doc, pure Catalyst:
    transform over token indices, then explode (in-row array_distinct,
    no shuffle)."""
    return _tok_grams(df, n, text_col, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(F.col("_grams"))).alias("shingle")
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequent word n-grams — boilerplate/template detection for
    training-data curation: the document frequency of every distinct
    shingle, kept where df ≥ ``min_df``.  Output (shingle, df).

    Scale shape: ``shingle_df`` emits each shingle at most once per doc,
    so one hash ``groupBy(shingle).count()`` IS the document frequency —
    a single map-side-combinable aggregation, no joins, no doc×doc
    blowup; at 100 TB the combiner collapses each partition to its
    distinct-shingle histogram before the shuffle."""
    return (
        shingle_df(df, n, text_col, id_col)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )


def dup_spans(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Locate corpus-frequent n-grams INSIDE each document: (id, pos,
    shingle) rows for every token position whose n-gram has document
    frequency ≥ ``min_df`` — the span-level view a curation pipeline
    needs to STRIP boilerplate rather than drop whole documents
    (exact-substring dedup in the spirit of Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022, §4.1).

    Scale shape: the corpus is tokenized ONCE — the positional frame is
    materialised (eager localCheckpoint, the jaccard_dedup_pairs
    precedent) and feeds BOTH the df histogram (distinct-per-doc →
    map-side-combinable count) and the span join, instead of two full
    scan+split+gram passes; hot shingles broadcast back against the
    positions — no doc×doc join.  ``pos`` is the 0-based token offset of
    the n-gram start."""
    positions = (
        _tok_grams(df, n, text_col, id_col)
        .select(F.col(id_col), F.posexplode(F.col("_grams")).alias("pos", "shingle"))
        .localCheckpoint(eager=True)
    )
    hot = (
        positions.dropDuplicates([id_col, "shingle"])
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle")
    )
    return positions.join(F.broadcast(hot), "shingle").select(
        id_col, F.col("pos").cast("long").alias("pos"), "shingle"
    )


def strip_boilerplate(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a corpus-frequent n-gram span —
    the STRIP step of the detect (``boilerplate_ngrams``) → locate
    (``dup_spans``) → strip curation loop.  Output (id, text_clean,
    n_removed); documents with no hot span pass through verbatim.

    Scale shape: hot spans per doc collapse to one covered-position
    array (bounded by the doc's own token count), joined back LEFT so
    clean docs never shuffle their text through an aggregation; the
    token filter is a Catalyst lambda over the split array — no UDF."""
    spans = dup_spans(df, n, min_df, text_col, id_col)
    covered = spans.groupBy(id_col).agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(F.sequence(F.col("pos"), F.col("pos") + (n - 1)))
            )
        ).alias("_covered")
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("_covered"), i.cast("bigint")), F.lit(False)
        ),
    )
    return (
        df.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("text_clean"),
            F.coalesce(F.size("_covered"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
        )
    )


def jaccard_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs via inverted-index self-join.

    Jaccard ≥ num/den decided in integer arithmetic (den·|∩| ≥ num·|∪|) —
    no float, bit-exact vs any oracle.  Output: (id_a, id_b, inter, uni),
    id_a < id_b.

    ``max_df``: document-frequency cap for CANDIDATE generation — a
    stop-phrase shared by 1% of a 100 TB corpus makes the uncapped
    self-join O(df²) (VERDICT What's-wrong #7).  With a cap, candidates
    come only from shingles with df ≤ max_df, but inter/uni are then
    recomputed over ALL shingles of the candidate pairs, so every emitted
    pair is still exact; only pairs sharing exclusively-hot shingles can be
    missed, and the number of dropped shingles is logged (no silent caps).
    """
    # materialize shingles ONCE: the frame feeds sizes, the df histogram,
    # candidate generation, and the exact-intersection recount — without
    # this the shingling subtree re-evaluates per branch (5x at sf0.1).
    # Same trade at 100 TB: store one stage output vs recompute it four
    # times; localCheckpoint blocks release when the frame goes out of scope.
    sh = shingle_df(df, n, text_col, id_col).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        n_hot = dfreq.filter(F.col("df") > max_df).count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "jaccard_dedup_pairs: dropping %d shingles with df > %d from "
                "candidate generation (pairs sharing only these are missed; "
                "emitted pairs remain exact)",
                n_hot,
                max_df,
            )
        cold = sh.join(
            F.broadcast(dfreq.filter(F.col("df") <= max_df).select("shingle")), "shingle"
        )
        a = cold.alias("a")
        b = cold.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )
        inter = _exact_intersections(cand, sh, id_col)
    else:
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


def _exact_intersections(cand: DataFrame, sh: DataFrame, id_col: str) -> DataFrame:
    """|A∩B| over ALL shingles for each candidate (id_a, id_b) pair."""
    ia = sh.withColumnRenamed(id_col, "id_a")
    ib = sh.withColumnRenamed(id_col, "_rid").withColumnRenamed("shingle", "shingle_b")
    return (
        cand.join(ia, "id_a")
        .join(ib, (F.col("id_b") == F.col("_rid")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )


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
    df: DataFrame,
    num_hashes: int = 128,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>) — MinHash over word n-gram shingles.

    Shingle hashing runs JVM-side inside whole-stage codegen; the pandas UDF
    only does the vectorised (a·h+b) mod p min-reduction — no per-character
    Python anywhere.  ``hash_fn``: ``xxhash64`` (fastest, default) or
    ``arith`` (31-bit polynomial fold — exactly reproducible in ANSI SQL so
    the driver oracle can replay the pipeline; see contract.py).
    ``shingles``: optional precomputed ``shingle_df`` output, so callers
    that also need the shingle sets (exact verify) shingle once.

    Measured alternative, rejected: expressing the min-reduction as 128
    Catalyst ``min()`` aggregates (map-side combine, no Python exchange)
    is 3× SLOWER at sf0.1 (interleaved A/B, warm: 0.93 s vs 2.89 s) —
    the arithmetic work is identical (128 multiply-mods per shingle)
    and numpy executes it vectorised at memory bandwidth, while 128
    scalar aggregate expressions pay per-row interpretation.  The
    collect_list shuffle is NOT a scale hazard: each list is one
    document's shingle hashes (bounded by document length, independent
    of dataset size), 8 B/shingle — the same bytes any shuffle of the
    shingle frame moves."""
    a_params, b_params = _minhash_params(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        # NOTE (r6): a fully-vectorized variant (one concatenated matrix
        # + np.minimum.reduceat over doc offsets) was measured SLOWER
        # than this per-doc loop at bench shape (0.66 s vs 0.46 s warm,
        # sf0.1) — the per-doc matrices are cache-resident and the
        # reduceat pays a strided column sweep over the 8 MB batch
        # matrix; kept the loop.
        out = []
        for arr in hashes:
            th = (np.asarray(arr, dtype=np.int64).astype(np.uint64)) & _P31
            hv = (a_params[None, :] * th[:, None] + b_params[None, :]) % _P31
            out.append(hv.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    sh = shingles if shingles is not None else shingle_df(df, n, text_col, id_col)
    hcol = (
        arith_hash31_col(F.col("shingle")) if hash_fn == "arith" else F.xxhash64("shingle")
    )
    grouped = (
        sh.select(F.col(id_col), hcol.alias("h"))
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
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with EXACT Jaccard.

    Emitted pairs are true positives (≥ threshold) — LSH only bounds recall.
    Output: (id_a, id_b, jaccard).  ``hash_fn='arith'`` makes every stage
    (shingle hash, band bucket) ANSI-SQL-reproducible for the driver oracle."""
    rows_per_band = num_hashes // bands

    def bucket_of(bi: int):
        elems = [F.element_at("sig", bi * rows_per_band + j + 1) for j in range(rows_per_band)]
        if hash_fn == "arith":
            return F.concat_ws(",", *[e.cast("string") for e in elems])
        return F.xxhash64(*elems).cast("string")

    # shingle ONCE: the checkpointed frame feeds the signatures, the
    # size counts and both sides of the exact-verify intersection
    sh = shingle_df(df, n, text_col, id_col).localCheckpoint(eager=True)
    # NOTE (r6): materializing `sigs` with an eager localCheckpoint was
    # tried and REVERTED — it removes the double evaluation of the sig
    # subtree under the banded self-join, but the two copies run as
    # parallel subtrees of ONE job while the checkpoint serializes a
    # full extra job before the join (measured 2.65 s → 3.7 s at sf0.1).
    sigs = minhash_signatures(
        df, num_hashes, n, text_col, id_col, hash_fn=hash_fn, shingles=sh
    )
    band_cols = F.explode(
        F.array(
            *[
                F.struct(F.lit(bi).alias("band"), bucket_of(bi).alias("bucket"))
                for bi in range(bands)
            ]
        )
    )
    banded = sigs.select(F.col(id_col), band_cols.alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # r6: same-bucket candidate pairs via ONE groupBy + in-bucket pair
    # explode instead of a banded self-join — the self-join evaluated the
    # whole signature subtree (collect_list shuffle + Python min-hash
    # kernel + band explode) once per side (plan-audited), and its two
    # join-side exchanges carried the banded rows twice.  Pair set is
    # identical: ids are unique within a (band, bucket), sorted ascending,
    # paired (i < j), then distinct across bands exactly as before.  The
    # explode streams one tail-slice array per row (≤ bucket size), so a
    # hot bucket costs the same quadratic pair count as the join did,
    # never a quadratic in-memory array.
    cand = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") >= 2)
        .select(F.col("_ids"), F.posexplode("_ids").alias("_i", "id_a"))
        .select(
            "id_a",
            F.explode(F.expr("slice(_ids, _i + 2, size(_ids))")).alias("id_b"),
        )
        .distinct()
    )
    # exact verify: join the (already materialized) shingle sets back
    # on the candidate pairs
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


def _simhash_udf(n_bits: int):
    @pandas_udf(LongType())
    def simhash_from_hashes(hashes: pd.Series) -> pd.Series:
        """n-bit SimHash from pre-hashed tokens (vectorised bit voting)."""
        out = np.empty(len(hashes), dtype=np.int64)
        shifts = np.arange(n_bits, dtype=np.uint64)[None, :]
        pow2 = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)
        for i, arr in enumerate(hashes):
            th = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            v = (bits * 2 - 1).sum(axis=0)
            out[i] = np.int64((pow2[v > 0]).sum().astype(np.uint64))
        return pd.Series(out)

    return simhash_from_hashes


simhash_from_hashes = _simhash_udf(64)


def simhash_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sh) — token hashing JVM-side, bit voting in numpy.
    ``hash_fn='arith'`` → 62-bit token hashes from the SQL-reproducible
    polynomial fold (the driver oracle replays bit voting in SQL)."""
    from ..partitioning import widen_if_narrow

    toks = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    base = widen_if_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), toks
    )
    if hash_fn == "arith":
        hashed = base.select(F.col(id_col), arith_hash62_col(F.col("tok")).alias("h"))
        udf = _simhash_udf(62)
    else:
        hashed = base.select(F.col(id_col), F.xxhash64("tok").alias("h"))
        udf = _simhash_udf(64)
    grouped = hashed.groupBy(id_col).agg(F.collect_list("h").alias("hs"))
    return grouped.select(F.col(id_col), udf(F.col("hs")).alias("sh"))


def simhash_block_layout(n_bits: int, blocks: int) -> list[tuple[int, int]]:
    """(offset, width) per block — an exact partition of ``n_bits`` into
    ``blocks`` non-empty blocks.  r1 used ``64 // blocks`` which left the
    top ``64 % blocks`` bits UNCOVERED, voiding the pigeonhole guarantee
    (a pair differing in an uncovered bit + r others could be missed)."""
    q, rem = divmod(n_bits, blocks)
    layout, off = [], 0
    for i in range(blocks):
        w = q + (1 if i < rem else 0)
        layout.append((off, w))
        off += w
    return layout


def hamming_pairs(
    h: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int,
    n_bits: int = 64,
) -> DataFrame:
    """All (id_a, id_b, hamming) pairs with hamming(hash) ≤ r over a table
    of 64-bit-ish hashes, via pigeonhole block join: partition the hash
    bits into r+1 blocks; any pair within r shares ≥1 full block →
    equi-join per block, then exact popcount filter.  100% recall by
    construction (the emitted set IS all pairs within r).  Shared core of
    ``simhash_pairs`` (text) and ``image.spark.phash_near_dup`` (images)."""
    blocks = max_hamming + 1
    parts = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("blk"),
                    F.shiftrightunsigned(F.col(hash_col), off)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for bi, (off, width) in enumerate(simhash_block_layout(n_bits, blocks))
            ]
        )
    )
    banded = h.select(id_col, hash_col, parts.alias("p")).select(
        id_col, hash_col, F.col("p.blk").alias("blk"), F.col("p.key").alias("key")
    )
    # r6: same-block candidate pairs via ONE groupBy + in-bucket pair
    # explode instead of a self-join — the join evaluated the upstream
    # hash subtree (e.g. the distinct-phash aggregation) once per side.
    # (id, hash) structs sort by id first (ids unique per block), so the
    # (i < j) tail-slice pairing emits exactly the old a.id < b.id pair
    # set; the slice arrays stream one row at a time (see
    # minhash_lsh_pairs).  Exact popcount verify unchanged.
    cand = (
        banded.groupBy("blk", "key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(hash_col).alias("h")))
            ).alias("_es")
        )
        .filter(F.size("_es") >= 2)
        .select(F.col("_es"), F.posexplode("_es").alias("_i", "_a"))
        .select(
            "_a", F.explode(F.expr("slice(_es, _i + 2, size(_es))")).alias("_b")
        )
        .select(
            F.col("_a.i").alias("id_a"),
            F.col("_b.i").alias("id_b"),
            F.col("_a.h").alias("sh_a"),
            F.col("_b.h").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ r — ``simhash_df`` then the
    pigeonhole ``hamming_pairs`` core."""
    n_bits = 62 if hash_fn == "arith" else 64
    h = simhash_df(df, text_col, id_col, hash_fn=hash_fn)
    return hamming_pairs(h, "sh", id_col, max_hamming, n_bits=n_bits)
