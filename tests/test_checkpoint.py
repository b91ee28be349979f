"""Resume semantics: kill-after-stage-1 simulation -> rerun skips completed
partitions and the final result is identical (SURVEY.md §5.2 Resume)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ddsketch_spark.config import DDSketchConfig
from ddsketch_spark.operators import sketch_agg as udaf
from ddsketch_spark.plans import checkpoint as ck
from ddsketch_spark.sources.fixtures import generate_tokens_table

CFG = DDSketchConfig()


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_then_resume_identical(spark, ckpt_dir):
    df = spark.read.parquet(generate_tokens_table(2000))
    baseline = {
        r["source"]: r
        for r in udaf.sketch_udaf(df, "n_tok", CFG, group_cols=("source",)).collect()
    }

    # full run with checkpointing
    out1 = ck.sketch_with_checkpoint(
        spark, df, "n_tok", CFG, group_cols=("source",), checkpoint_dir=ckpt_dir
    )
    m1 = {r["source"]: r for r in out1.collect()}

    # resume run: every partition already checkpointed -> nothing rebuilt
    out2 = ck.sketch_with_checkpoint(
        spark, df, "n_tok", CFG, group_cols=("source",), checkpoint_dir=ckpt_dir
    )
    m2 = {r["source"]: r for r in out2.collect()}

    for s in baseline:
        for m in (m1, m2):
            assert m[s]["n"] == baseline[s]["n"]
            assert list(m[s]["keys"]) == list(baseline[s]["keys"])
            assert list(m[s]["counts"]) == list(baseline[s]["counts"])


def test_partial_checkpoint_resume(spark, ckpt_dir):
    df = spark.read.parquet(generate_tokens_table(2000)).repartition(6)
    # simulate a killed job: checkpoint, then delete some partial rows
    parts = ck.build_partials_resumable(
        spark, df, "n_tok", CFG, checkpoint_dir=ckpt_dir
    )
    all_pids = sorted(r["partition_id"] for r in parts.select("partition_id").distinct().collect())
    assert len(all_pids) >= 2

    import os
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    data_dir = os.path.join(ckpt_dir, "partials")
    # rewrite the checkpoint keeping only half the partitions ("crash")
    kept_pids = set(all_pids[: len(all_pids) // 2])
    tbl = pq.read_table(data_dir)
    pdf = tbl.to_pandas()
    kept = pdf[pdf["partition_id"].isin(kept_pids)]
    shutil.rmtree(data_dir)
    os.makedirs(data_dir)
    pq.write_table(pa.Table.from_pandas(kept, preserve_index=False,
                                        schema=tbl.schema), f"{data_dir}/part-0.parquet")

    # resume: must rebuild exactly the missing partitions
    parts2 = ck.build_partials_resumable(
        spark, df, "n_tok", CFG, checkpoint_dir=ckpt_dir
    )
    pids2 = sorted(r["partition_id"] for r in parts2.select("partition_id").distinct().collect())
    assert pids2 == all_pids

    merged = udaf.merge_partials(parts2.drop("partition_id", "input_files")).collect()[0]
    want = udaf.sketch_udaf(df, "n_tok", CFG).collect()[0]
    assert merged["n"] == want["n"]
    assert list(merged["keys"]) == list(want["keys"])
    assert list(merged["counts"]) == list(want["counts"])
