"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-source DDSketch quantiles of
document lengths) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
oracle-checked operator suite (ddsketch_spark.plans.query_suite).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source DDSketch quantiles of documents.n_chars at
    sf0.001 (the north-star query shape: per-source + global quantiles)."""
    from ddsketch_spark.plans.query_suite import queries as _qs

    return _qs()["dds_quantiles_nchars_by_source"](spark, "/root/testdata/sf0.001")


def _suites():
    from ddsketch_spark.plans import (
        approx_suite,
        dedup_suite,
        multimodal_suite,
        pipeline_suite,
        query_suite,
        sampling_suite,
        sim_text_suite,
        tokens_suite,
    )

    # Ordered so the most recently changed / previously-ungraded suites come
    # first: the driver grades at most the first 50 registry entries
    # (VERDICT r4 item 1 — r4's 53-entry registry left the last three
    # queries ungraded). The registry is also consolidated back to <= 50
    # entries (plans.approx_suite), so ordering is defense in depth.
    return (
        query_suite,
        pipeline_suite,
        sampling_suite,
        approx_suite,
        tokens_suite,
        dedup_suite,
        sim_text_suite,
        multimodal_suite,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for suite in _suites():
        out.update(suite.queries())
    return out


def oracle_sql(oracle_sf_dir: str | None = None) -> dict[str, str]:
    """``oracle_sf_dir``: the sf_dir the Spark side of the comparison runs
    at (defaults to the driver's sf0.01 contract). Threaded into suites
    whose oracle SQL embeds scale-derived literals (the IVF centroids)."""
    import inspect

    out: dict[str, str] = {}
    for suite in _suites():
        if "oracle_sf_dir" in inspect.signature(suite.oracle_sql).parameters:
            out.update(suite.oracle_sql(oracle_sf_dir=oracle_sf_dir))
        else:
            out.update(suite.oracle_sql())
    return out
