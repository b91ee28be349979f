#!/usr/bin/env python
"""Row-for-row token-array equality audit (north-rule invariant).

Sketch jobs must never mutate the source data: after any pipeline run, the
tokens table's arrays must equal the source byte-for-byte. This job joins a
candidate table (a written-back copy, a checkpoint restore, or the source
itself re-read) against the source on doc_id and reports:

  rows_source / rows_candidate / rows_joined,
  n_mismatched_arrays (full-array inequality, null-safe),
  n_mismatched_ntok   (n_tok != size(tokens)),
  first 10 mismatched doc_ids.

Exit code 1 on any mismatch. Run:
    spark-submit jobs/token_audit.py --source DIR [--candidate DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def audit(spark: SparkSession, source: str, candidate: str | None) -> dict:
    src = spark.read.parquet(source)
    cand = spark.read.parquet(candidate) if candidate else spark.read.parquet(source)
    j = src.select(
        "doc_id", F.col("tokens").alias("t_src"), F.col("n_tok").alias("n_src")
    ).join(
        cand.select(
            "doc_id", F.col("tokens").alias("t_cand"), F.col("n_tok").alias("n_cand")
        ),
        "doc_id",
        "full_outer",
    )
    checks = j.select(
        "doc_id",
        (~F.col("t_src").eqNullSafe(F.col("t_cand"))).alias("arr_bad"),
        (F.col("n_src") != F.size(F.col("t_src"))).alias("ntok_bad"),
        F.col("t_src").isNull().alias("missing_src"),
        F.col("t_cand").isNull().alias("missing_cand"),
    ).cache()
    agg_row = checks.agg(
        F.count(F.lit(1)).alias("joined"),
        F.sum(F.col("arr_bad").cast("long")).alias("arr_bad"),
        F.sum(F.col("ntok_bad").cast("long")).alias("ntok_bad"),
        F.sum(F.col("missing_src").cast("long")).alias("missing_src"),
        F.sum(F.col("missing_cand").cast("long")).alias("missing_cand"),
    ).collect()[0]
    bad_ids = [
        r["doc_id"]
        for r in checks.where(F.col("arr_bad") | F.col("ntok_bad")).limit(10).collect()
    ]
    return {
        "rows_source": src.count(),
        "rows_candidate": cand.count(),
        "rows_joined": agg_row["joined"],
        "n_mismatched_arrays": int(agg_row["arr_bad"] or 0),
        "n_mismatched_ntok": int(agg_row["ntok_bad"] or 0),
        "n_missing_source": int(agg_row["missing_src"] or 0),
        "n_missing_candidate": int(agg_row["missing_cand"] or 0),
        "first_bad_doc_ids": bad_ids,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--candidate", default=None)
    args = ap.parse_args()
    spark = SparkSession.builder.appName("token-audit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    result = audit(spark, args.source, args.candidate)
    print(json.dumps(result))
    spark.stop()
    ok = (
        result["n_mismatched_arrays"] == 0
        and result["n_mismatched_ntok"] == 0
        and result["n_missing_source"] == 0
        and result["n_missing_candidate"] == 0
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
