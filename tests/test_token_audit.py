"""Token-array equality audit: clean source passes; a corrupted candidate
is caught with exact counts (north-rule per-row invariant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobs.token_audit import audit


@pytest.fixture(scope="module")
def tokens_path(tmp_path_factory):
    from ddsketch_spark.sources.fixtures import generate_tokens_table

    return generate_tokens_table(2000)


def test_audit_clean(spark, tokens_path):
    res = audit(spark, tokens_path, None)
    assert res["n_mismatched_arrays"] == 0
    assert res["n_mismatched_ntok"] == 0
    assert res["rows_source"] == res["rows_joined"] == 2000


def test_audit_catches_corruption(spark, tokens_path, tmp_path):
    src = spark.read.parquet(tokens_path)
    corrupted = src.withColumn(
        "tokens",
        F.when(F.col("n_tok") > 50, F.slice("tokens", 1, 5)).otherwise(F.col("tokens")),
    )
    out = str(tmp_path / "corrupted")
    corrupted.write.parquet(out)
    n_bad = src.where(F.col("n_tok") > 50).count()
    res = audit(spark, tokens_path, out)
    assert res["n_mismatched_arrays"] == n_bad
    assert len(res["first_bad_doc_ids"]) == min(10, n_bad)
