"""Explicit skew control: salted repartitioning + skew diagnostics.

The north rule calls for explicit salting/repartitioning on skewed sources
(the fixture's `source` column is zipfian by design: web ~37%). Sketch
merges are associative + commutative, so regrouping by (key, salt) then
re-merging by key is *exact* -- salting costs nothing semantically.

Two layers of defense against skew in this engine:
  1. the partial/merge UDAF path is skew-immune by construction (partials
     are per input partition, uniform regardless of key distribution);
  2. for key-grouped stages (histograms, per-source merges), `salted_by`
     splits each hot key across `buckets` sub-groups; downstream re-merges
     with the canonical merge. AQE's skew-join handling covers joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_by(
    df: DataFrame,
    salt_source: Column | str = "doc_id",
    buckets: int = 16,
) -> DataFrame:
    """Add a deterministic salt column: pmod(xxhash64(salt_source), buckets).
    Deterministic (no rand()), so retries and resumes see stable salts."""
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(src), F.lit(buckets)).cast("int"))


def repartition_salted(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_source: Column | str = "doc_id",
    buckets: int = 16,
) -> DataFrame:
    """Repartition by (key..., salt): hot keys spread over `buckets`
    partitions instead of one. Callers groupBy(key..., SALT_COL), then
    merge the per-salt partials by key (exact for all sketches here)."""
    salted = salted_by(df, salt_source, buckets)
    return salted.repartition(*[F.col(c) for c in key_cols], F.col(SALT_COL))


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """(key, cnt, fraction) for the `top` heaviest keys -- the diagnostic
    that decides whether salting is needed (fraction >> 1/#partitions)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("fraction", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.col("cnt").desc())
        .limit(top)
    )
