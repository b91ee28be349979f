"""The oracle-checked query suite.

Each entry pairs a Spark DataFrame query (the product) with an ANSI-SQL
reproduction runnable by DuckDB on the same parquet tables (the oracle).
DDSketch is deterministic arithmetic, so even the sketch queries get
value-level oracles: the SQL reproduces the gamma-bucket keying, histogram,
rank walk, and midpoint estimator exactly. Float estimates are compared as
6-significant-digit integer mantissas (see functions.ddsketch_sql.sig6).

Config note: oracle-mode sketches use bin_limit=4096 so no collapse fires at
the oracle scale (every table here keys into < 700 bins) -- collapse is
separately exercised by `dds_price_hist_collapsed`, whose oracle applies the
integer gamma^2 key remap a fixed number of times.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ddsketch_spark.config import Q_GRID, DDSketchConfig
from ddsketch_spark.functions.ddsketch_sql import SIG6_SQL, sig6_mantissa
from ddsketch_spark.operators import ddsketch_agg as agg
from ddsketch_spark.sources.tables import read_table

# oracle-mode config: collapse-free at test scale
OCFG = DDSketchConfig(bin_limit=4096)
# q literals cast to DOUBLE so the oracle's stop = q*(n-1) is IEEE-double
# arithmetic exactly like the Spark/numpy side (DuckDB would otherwise parse
# 0.01 as DECIMAL and compute an exact stop that can flip a boundary bucket)
QS = ", ".join(f"CAST({q} AS DOUBLE)" for q in Q_GRID)


def _key_sql(v: str = "v") -> str:
    return (
        f"CASE WHEN {v} > 0 THEN CAST(ceil(ln({v})/{OCFG.ln_gamma!r}) AS BIGINT) + {OCFG.offset} "
        f"WHEN {v} < 0 THEN -CAST(ceil(ln(-{v})/{OCFG.ln_gamma!r}) AS BIGINT) - {OCFG.offset} "
        f"ELSE 0 END"
    )


def _estimate_sql(k: str = "key", gamma: float | None = None) -> str:
    g = repr(gamma if gamma is not None else OCFG.gamma)
    off = OCFG.offset
    return (
        f"CASE WHEN {k} > 0 THEN 2*power({g}, CAST({k} - {off} AS DOUBLE))/({g}+1) "
        f"WHEN {k} < 0 THEN -2*power({g}, CAST(-({k} + {off}) AS DOUBLE))/({g}+1) "
        f"ELSE 0.0 END"
    )


def _quantile_oracle_sql(table: str, value_expr: str, group: str | None = None) -> str:
    """Full DDSketch quantile pipeline in SQL: key -> histogram -> cumulative
    walk with stop = q*(n-1) (reference: ddsketch.cc:538) -> midpoint
    estimate, optionally per group."""
    gsel = f"{group}, " if group else ""
    gby = f"GROUP BY {group}, key" if group else "GROUP BY key"
    gpart = f"PARTITION BY {group}" if group else ""
    gjoin = f"AND c.{group} = qs.{group}" if group else ""
    qs_src = (
        f"(SELECT DISTINCT {group}, UNNEST([{QS}]) AS q FROM hist) "
        if group
        else f"(SELECT UNNEST([{QS}]) AS q) "
    )
    return f"""
WITH keyed AS (
  SELECT {gsel}{_key_sql('v')} AS key
  FROM (SELECT {gsel}CAST({value_expr} AS DOUBLE) AS v FROM {table} WHERE {value_expr} IS NOT NULL)
),
hist AS (SELECT {gsel}key, COUNT(*) AS cnt FROM keyed {gby}),
tot AS (SELECT {gsel}CAST(SUM(cnt) AS BIGINT) AS n FROM hist {('GROUP BY ' + group) if group else ''}),
cum AS (SELECT {gsel}key, SUM(cnt) OVER ({gpart} ORDER BY key) AS cumc FROM hist),
qs AS (SELECT * FROM {qs_src}),
sel AS (
  SELECT {('qs.' + group + ' AS ' + group + ',') if group else ''} qs.q AS q,
         (SELECT MIN(c.key) FROM cum c, tot t
           WHERE c.cumc > qs.q * (t.n - 1) {gjoin}
                 {('AND t.' + group + ' = qs.' + group) if group else ''}) AS key,
         (SELECT t.n FROM tot t {('WHERE t.' + group + ' = qs.' + group) if group else ''}) AS n
  FROM qs
)
SELECT {gsel}q,
  CASE WHEN key > 0 THEN key - {OCFG.offset} WHEN key < 0 THEN key + {OCFG.offset} ELSE 0 END AS bucket_key,
  {SIG6_SQL.format(x=_estimate_sql('key'))} AS est_m6,
  n
FROM sel
"""


def _quantiles_spark(
    spark: SparkSession, sf_dir: str, table: str, value_col: str, group: str | None
) -> DataFrame:
    df = read_table(spark, sf_dir, table)
    groups = (group,) if group else ()
    out = agg.quantiles(df, value_col, Q_GRID, OCFG, group_cols=groups)
    cols = ([group] if group else []) + ["q", "bucket_key"]
    return out.select(
        *cols, sig6_mantissa(F.col("estimate")).alias("est_m6"), "n"
    )


# ---------------------------------------------------------------------------
# histogram / collapse / delete queries
# ---------------------------------------------------------------------------

def _hist_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    hist = agg.histogram(df, "l_extendedprice", OCFG)
    from ddsketch_spark.functions.ddsketch_sql import dds_strip_offset

    return hist.select(
        dds_strip_offset(F.col("key"), OCFG).alias("bucket_key"),
        F.col("cnt").alias("cnt"),
    )


_HIST_SQL = f"""
WITH keyed AS (
  SELECT {_key_sql('v')} AS key
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem WHERE l_extendedprice IS NOT NULL)
)
SELECT CASE WHEN key > 0 THEN key - {OCFG.offset} WHEN key < 0 THEN key + {OCFG.offset} ELSE 0 END AS bucket_key,
       COUNT(*) AS cnt
FROM keyed GROUP BY key
"""

# collapsed histogram: Spark runs the real bounded-memory operator
# (bin_limit=80 -> exactly 2 gamma^2 collapses on this table); the oracle
# applies the integer key remap twice: positive stored keys ceil(s/2) per
# level, negative floor(s/2) (reference: DDS_CollapseKey, ddsketch.cc:183-209)
_COLLAPSE_LIMIT = 80
_COLLAPSE_LEVELS = 2


def _collapsed_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    cfg = DDSketchConfig(bin_limit=_COLLAPSE_LIMIT)
    sk = agg.sketch(df, "l_extendedprice", cfg)
    out = sk.select(
        F.col("level"),
        F.posexplode(F.arrays_zip(F.col("keys"), F.col("counts"))).alias("pos", "kc"),
    ).select(
        "level",
        (F.col("kc.keys") - F.lit(cfg.offset)).alias("bucket_key"),
        F.col("kc.counts").alias("cnt"),
    )
    return out


def _collapsed_oracle_sql() -> str:
    off = OCFG.offset
    remap = "CASE WHEN k > 0 THEN CAST(floor((k - {off} + 1) / 2.0) AS BIGINT) + {off} ELSE k END"
    # all lineitem prices are positive -> stored keys positive; remap is
    # ceil(stripped/2) == floor((stripped+1)/2)
    expr = "key"
    for _ in range(_COLLAPSE_LEVELS):
        expr = f"CAST(floor((({expr}) - {off} + 1) / 2.0) AS BIGINT) + {off}"
    return f"""
WITH keyed AS (
  SELECT {_key_sql('v')} AS key
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem WHERE l_extendedprice IS NOT NULL)
)
SELECT {_COLLAPSE_LEVELS} AS level,
       ({expr}) - {off} AS bucket_key,
       COUNT(*) AS cnt
FROM keyed GROUP BY 2
"""


def _delete_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    sk = agg.sketch(df, "l_quantity", OCFG)
    deleted = agg.delete_from_sketch(
        sk, df.where(F.col("l_returnflag") == "R"), "l_quantity", OCFG
    )
    from ddsketch_spark.functions.ddsketch_sql import dds_strip_offset

    return deleted.select(
        F.posexplode(F.arrays_zip(F.col("keys"), F.col("counts"))).alias("pos", "kc")
    ).select(
        (F.col("kc.keys") - F.lit(OCFG.offset)).alias("bucket_key"),
        F.col("kc.counts").alias("cnt"),
    )


# deleting the 'R' multiset from the full sketch leaves exactly the
# complement histogram (every deleted bin count <= inserted bin count)
_DELETE_SQL = f"""
WITH keyed AS (
  SELECT {_key_sql('v')} AS key
  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_returnflag <> 'R')
)
SELECT key - {OCFG.offset} AS bucket_key, COUNT(*) AS cnt
FROM keyed GROUP BY key
"""


# ---------------------------------------------------------------------------
# error bounds of the lossy collapse variants (getErrorBound parity,
# main.cpp:1108-1152) + rollup
# ---------------------------------------------------------------------------

_EB_LIMIT = 64


def _error_bound_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "lineitem")
    outs = []
    for collapse in ("last", "first"):
        cfg = DDSketchConfig(bin_limit=_EB_LIMIT, collapse=collapse)
        sk = agg.sketch(df, "l_extendedprice", cfg)
        fat = (
            F.element_at("counts", -1) if collapse == "last" else F.element_at("counts", 1)
        )
        lo = F.lit(0.0) if collapse == "last" else fat.cast("double") / F.col("n")
        hi = (
            F.lit(1.0) - fat.cast("double") / F.col("n")
            if collapse == "last"
            else F.lit(1.0)
        )
        outs.append(
            sk.select(
                F.lit(collapse).alias("collapse"),
                F.col("n"),
                fat.alias("fat_count"),
                lo.alias("q_lo"),
                hi.alias("q_hi"),
            )
        )
    return outs[0].unionByName(outs[1])


def _error_bound_oracle_sql() -> str:
    # lazy bulk collapse keeps the (bin_limit - 1) smallest (last-variant) /
    # largest (first-variant) bins and folds everything else into one fat
    # tail bin, so fat_count = n - sum(kept counts)
    keep = _EB_LIMIT - 1
    return f"""
WITH keyed AS (
  SELECT {_key_sql('v')} AS key
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem WHERE l_extendedprice IS NOT NULL)
),
hist AS (SELECT key, COUNT(*) AS c FROM keyed GROUP BY key),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
keep_last AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM (SELECT c FROM hist ORDER BY key ASC LIMIT {keep})),
keep_first AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM (SELECT c FROM hist ORDER BY key DESC LIMIT {keep}))
SELECT 'last' AS collapse, n, n - keep_last.s AS fat_count,
       0.0 AS q_lo, 1.0 - (n - keep_last.s)::DOUBLE / n AS q_hi
FROM tot, keep_last
UNION ALL
SELECT 'first' AS collapse, n, n - keep_first.s AS fat_count,
       (n - keep_first.s)::DOUBLE / n AS q_lo, 1.0 AS q_hi
FROM tot, keep_first
"""


def _weighted_quantiles_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of price where each row counts l_quantity times (the
    core's add_weighted semantics through the JVM histogram path)."""
    df = read_table(spark, sf_dir, "lineitem")
    out = agg.quantiles(
        df, "l_extendedprice", Q_GRID, OCFG, weight=F.col("l_quantity").cast("long")
    )
    return out.select(
        "q", "bucket_key", sig6_mantissa(F.col("estimate")).alias("est_m6"), "n"
    )


_WEIGHTED_SQL = f"""
WITH keyed AS (
  SELECT {_key_sql('v')} AS key, w
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v, CAST(l_quantity AS BIGINT) AS w
        FROM lineitem WHERE l_extendedprice IS NOT NULL)
),
hist AS (SELECT key, CAST(SUM(w) AS BIGINT) AS cnt FROM keyed GROUP BY key),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
cum AS (SELECT key, SUM(cnt) OVER (ORDER BY key) AS cumc FROM hist),
qs AS (SELECT UNNEST([{QS}]) AS q),
sel AS (
  SELECT qs.q AS q,
         (SELECT MIN(c.key) FROM cum c, tot t WHERE c.cumc > qs.q * (t.n - 1)) AS key,
         (SELECT t.n FROM tot t) AS n
  FROM qs
)
SELECT q,
  CASE WHEN key > 0 THEN key - {OCFG.offset} WHEN key < 0 THEN key + {OCFG.offset} ELSE 0 END AS bucket_key,
  {SIG6_SQL.format(x=_estimate_sql('key'))} AS est_m6,
  n
FROM sel
"""


def _rollup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup (per-source + global) in one result -- the manual
    grouping-sets pattern (SURVEY.md §2.2)."""
    df = read_table(spark, sf_dir, "documents")
    per = _quantiles_spark(spark, sf_dir, "documents", "n_chars", "source")
    glob = _quantiles_spark(spark, sf_dir, "documents", "n_chars", None).withColumn(
        "source", F.lit("ALL")
    )
    return per.unionByName(glob.select(*per.columns))


def _rollup_oracle_sql() -> str:
    per = _quantile_oracle_sql("documents", "n_chars", "source")
    glob = _quantile_oracle_sql("documents", "n_chars")
    return f"""
SELECT * FROM ({per})
UNION ALL
SELECT 'ALL' AS source, q, bucket_key, est_m6, n FROM ({glob})
"""


# ---------------------------------------------------------------------------
# sketch-DRIVEN filtering: trim per-source outliers above the DDSketch p99
# (the way a pipeline actually consumes the sketch -- compute once, broadcast
# the tiny threshold table, filter the fact table in the scan stage). The
# threshold is the p99 BUCKET KEY (exact integer in both engines -- the same
# keyed CTE every green dds_* query stands on), so the filter is
# value-level deterministic; estimates never enter a comparison.
# ---------------------------------------------------------------------------

_TRIM_Q = 0.99


def _incremental_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance under the driver gate: build states
    over 2/3 of lineitem, fold the remaining 1/3 in via
    update_sketch_states, evaluate the quantile grid. The canonical merge
    makes the updated states byte-identical to a one-shot build, so the
    oracle is the ordinary full-table quantile SQL -- the driver hash-match
    therefore proves the incremental path end-to-end."""
    from ddsketch_spark.operators import sketch_agg as udaf

    df = read_table(spark, sf_dir, "lineitem")
    old = df.where(F.col("l_orderkey") % 3 != 0)
    new = df.where(F.col("l_orderkey") % 3 == 0)
    groups = ("l_returnflag",)
    states = udaf.sketch_udaf(old, "l_extendedprice", OCFG, group_cols=groups)
    updated = udaf.update_sketch_states(
        states, new, "l_extendedprice", OCFG, group_cols=groups
    )
    out = agg.quantiles_from_sketch(updated, Q_GRID, group_cols=groups)
    return out.select(
        *groups, "q", "bucket_key", sig6_mantissa(F.col("estimate")).alias("est_m6"), "n"
    )


def _trim_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_spark.functions.ddsketch_sql import dds_key, dds_strip_offset

    df = read_table(spark, sf_dir, "documents")
    thr = agg.quantiles(
        df, "n_chars", (_TRIM_Q,), OCFG, group_cols=("source",)
    ).select("source", F.col("bucket_key").alias("__thr_key"))
    keyed = df.select(
        "source",
        "n_chars",
        dds_strip_offset(
            dds_key(F.col("n_chars").cast("double"), OCFG), OCFG
        ).alias("__key"),
    )
    keep = F.col("__key") <= F.col("__thr_key")
    return (
        keyed.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_dropped"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("long")
            .alias("chars_kept"),
        )
    )


def _trim_oracle_sql() -> str:
    off = OCFG.offset
    strip = f"CASE WHEN key > 0 THEN key - {off} WHEN key < 0 THEN key + {off} ELSE 0 END"
    return f"""
WITH keyed AS (
  SELECT source, n_chars, {strip} AS skey
  FROM (
    SELECT source, n_chars, {_key_sql('v')} AS key
    FROM (SELECT source, n_chars, CAST(n_chars AS DOUBLE) AS v
          FROM documents WHERE n_chars IS NOT NULL)
  )
),
hist AS (SELECT source, skey, COUNT(*) AS cnt FROM keyed GROUP BY source, skey),
tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY source),
cum AS (SELECT source, skey, SUM(cnt) OVER (PARTITION BY source ORDER BY skey) AS cumc FROM hist),
thr AS (
  SELECT t.source,
         (SELECT MIN(c.skey) FROM cum c
           WHERE c.source = t.source AND c.cumc > CAST({_TRIM_Q} AS DOUBLE) * (t.n - 1)) AS thr_key
  FROM tot t
)
SELECT k.source,
       CAST(SUM(CASE WHEN k.skey <= thr.thr_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN k.skey > thr.thr_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN k.skey <= thr.thr_key THEN k.n_chars ELSE 0 END) AS BIGINT) AS chars_kept
FROM keyed k JOIN thr ON k.source = thr.source
GROUP BY k.source
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dds_quantiles_price": lambda s, d: _quantiles_spark(s, d, "lineitem", "l_extendedprice", None),
        "dds_quantiles_price_by_returnflag": lambda s, d: _quantiles_spark(s, d, "lineitem", "l_extendedprice", "l_returnflag"),
        "dds_quantiles_events_by_type": lambda s, d: _quantiles_spark(s, d, "events", "value", "event_type"),
        "dds_quantiles_nchars_by_source": lambda s, d: _quantiles_spark(s, d, "documents", "n_chars", "source"),
        "dds_histogram_price": _hist_spark,
        "dds_error_bound_collapse": _error_bound_spark,
        "dds_quantiles_rollup": _rollup_spark,
        "dds_weighted_quantiles_price": _weighted_quantiles_spark,
        "dds_histogram_price_collapsed": _collapsed_spark,
        "dds_delete_quantity": _delete_spark,
        "dds_trim_outliers_by_source": _trim_spark,
        "dds_incremental_update_quantiles": _incremental_spark,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dds_quantiles_price": _quantile_oracle_sql("lineitem", "l_extendedprice"),
        "dds_quantiles_price_by_returnflag": _quantile_oracle_sql("lineitem", "l_extendedprice", "l_returnflag"),
        "dds_quantiles_events_by_type": _quantile_oracle_sql("events", "value", "event_type"),
        "dds_quantiles_nchars_by_source": _quantile_oracle_sql("documents", "n_chars", "source"),
        "dds_histogram_price": _HIST_SQL,
        "dds_error_bound_collapse": _error_bound_oracle_sql(),
        "dds_quantiles_rollup": _rollup_oracle_sql(),
        "dds_weighted_quantiles_price": _WEIGHTED_SQL,
        "dds_histogram_price_collapsed": _collapsed_oracle_sql(),
        "dds_delete_quantity": _DELETE_SQL,
        "dds_trim_outliers_by_source": _trim_oracle_sql(),
        # incremental update is byte-identical to the full build, so its
        # oracle is the ordinary full-table per-group quantile SQL
        "dds_incremental_update_quantiles": _quantile_oracle_sql(
            "lineitem", "l_extendedprice", "l_returnflag"
        ),
    }
