"""End-to-end document curation: the composed pass a training-data
pipeline actually runs, built from the individually-oracled stages.

One call chains: quality gate (``text.quality_col``), repetition gates
(``text.repetition_frame``), PII scrub (``text.scrub_cols``), and
exact-dup representative selection (same normalized token-set key as
``dedup.exact_dedup``).  Every input doc comes back with its gate
verdicts and curated text; ``filter("kept")`` is the output corpus.

Shape at scale: the row-local derivations (quality, scrub, dedup key)
ride ONE projection over the corpus scan — no self-joins for per-row
columns.  The canonical member per dedup group is a window min over the
key (one exchange, no second corpus scan, no self-join), and the only
join is the repetition frame keyed on doc id.  Two corpus scans total
(base + grams), no Python anywhere — plan-gated in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import quality_col, repetition_cols_from_tokens, scrub_cols, tokens_col


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    max_top_bigram: float = 0.4,
    max_dup_trigram: float = 0.5,
) -> DataFrame:
    """(doc_id, text_clean, quality, top_bigram_frac, dup_trigram_frac,
    n_pii, is_canonical, kept) for every input doc.

    ``kept`` = passes the quality floor AND both repetition ceilings AND
    is its exact-dup group's canonical (min-id) member.  ``text_clean``
    is the PII-redacted text regardless of the verdict, so callers can
    keep rejected docs for audit without re-running the scrub."""
    from .dedup import dedup_key_col

    text = F.col(text_col)
    # r6: repetition fracs are row-local (repetition_cols_from_tokens) —
    # the gram-explode shuffle pair and the per-doc join the old
    # repetition_frame composition needed are gone; the ONLY exchange in
    # the whole curation pass is now the dedup-key window (guide §2.4).
    # The token array is materialized in the first projection so the gram
    # transform never re-splits the text per element (O(n²) hazard).
    # widen an unsplittable single-file scan so the row-local stage (6
    # regex passes + token sort folds) fans out; no-op at real scale and
    # order-safe (row-local cols + long-min window only)
    from ..partitioning import widen_if_narrow

    toked = widen_if_narrow(df.select(F.col(id_col), text)).select(
        F.col(id_col), text.alias("_text"), tokens_col(text).alias("_toks")
    )
    t = F.col("_text")
    red, counts = scrub_cols(t)
    n_pii = sum((c.cast("long") for c in counts), F.lit(0).cast("long"))
    top2, dup3 = repetition_cols_from_tokens(F.col("_toks"))
    base = toked.select(
        F.col(id_col),
        red.alias("text_clean"),
        quality_col(t).alias("quality"),
        n_pii.alias("n_pii"),
        dedup_key_col(t).alias("dedup_key"),
        top2.alias("top_bigram_frac"),
        dup3.alias("dup_trigram_frac"),
    )
    out = base.withColumn(
        "canonical_id", F.min(id_col).over(Window.partitionBy("dedup_key"))
    )
    top2 = F.col("top_bigram_frac")
    dup3 = F.col("dup_trigram_frac")
    is_canon = F.col(id_col) == F.col("canonical_id")
    kept = (
        (F.col("quality") >= F.lit(min_quality))
        & (top2 <= F.lit(max_top_bigram))
        & (dup3 <= F.lit(max_dup_trigram))
        & is_canon
    )
    return out.select(
        F.col(id_col),
        "text_clean",
        "quality",
        top2.alias("top_bigram_frac"),
        dup3.alias("dup_trigram_frac"),
        "n_pii",
        is_canon.alias("is_canonical"),
        kept.alias("kept"),
    )


def sample_bucket_col(id_col: Column, salt: str, buckets: int = 10000) -> Column:
    """Deterministic sampling bucket in [0, buckets): the SQL-reproducible
    62-bit polynomial hash (``dedup.arith_hash62_col``) over
    ``"<id>:<salt>"``.  No RNG, no partition-order dependence — the same
    row lands in the same bucket on every run, any cluster size, and in
    the DuckDB oracle."""
    from .dedup import arith_hash62_col

    return F.pmod(
        arith_hash62_col(F.concat(id_col.cast("string"), F.lit(":" + salt))),
        F.lit(buckets),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group mixture sampling — the corpus-assembly step
    that weights data sources for training (e.g. keep 100% en, 10% zh).
    A row is kept iff its hash bucket falls below ``rates[key]``
    (basis-point threshold; unlisted keys drop).  Pure Catalyst row-local
    filter: no shuffle, no RNG, reproducible by construction; rerunning
    with a higher rate yields a SUPERSET of the lower rate's sample
    (nested samples, the property mixture tuning needs)."""
    bucket = sample_bucket_col(F.col(id_col), salt)
    thresh = F.lit(0)
    for key, rate in sorted(rates.items()):
        thresh = F.when(F.col(key_col) == key, F.lit(int(round(rate * 10000)))).otherwise(
            thresh
        )
    return df.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < thresh
    )
