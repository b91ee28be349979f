"""Oracle-checked queries for the extension sketches (HLL / CMS / Bloom).

Every query here has a *value-level* DuckDB oracle: the SQL re-derives the
exact same registers / counters / bits from the shared cross-engine hash
(functions.hashing), so estimates compare exactly (integers) or at
6-significant-digit mantissa (floats, see functions.ddsketch_sql.sig6).

SQL shape: a `lin` CTE computes the linear universal hash as a column, a
`mixed` CTE applies the nonlinear h^2-mod-P mix (mix_sql expands its
argument many times, so it is always applied to a simple column name), and
the aggregation mirrors the numpy core line by line.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ddsketch_spark.core.bloom import BloomConfig
from ddsketch_spark.core.cms import CMSConfig
from ddsketch_spark.core.hll import HLLConfig
from ddsketch_spark.functions.ddsketch_sql import SIG6_SQL, sig6_mantissa
from ddsketch_spark.functions.hashing import (
    HASH_BITS,
    bitlen_sql,
    hash_sql,
    mix_sql,
)
from ddsketch_spark.operators import approx_agg as ops
from ddsketch_spark.sources.tables import read_table

HLL_CFG = HLLConfig(p=12)
CMS_CFG = CMSConfig(depth=4, width=2048)
BLOOM_CFG = BloomConfig(m_bits=1 << 16, k=5)


# ---------------------------------------------------------------------------
# HLL: distinct users per event type (+ global distinct parts)
# ---------------------------------------------------------------------------

def _hll_oracle_sql(table: str, value: str, group: str | None) -> str:
    cfg = HLL_CFG
    a, b = cfg.hash_ab
    m, p = cfg.m, cfg.p
    gsel = f"{group}, " if group else ""
    gby = f"GROUP BY {group}" if group else ""
    rest = f"(hm // {1 << p})"
    rho = f"({HASH_BITS - p} - {bitlen_sql(rest)} + 1)"
    return f"""
WITH lin AS (
  SELECT {gsel}{hash_sql(value, a, b)} AS h
  FROM {table} WHERE {value} IS NOT NULL
),
mixed AS (SELECT {gsel}{mix_sql('h')} AS hm FROM lin),
regs AS (
  SELECT {gsel}hm % {m} AS idx, MAX({rho}) AS rho
  FROM mixed GROUP BY {gsel}idx
),
agg AS (
  SELECT {gsel}
         SUM(power(2.0, -rho)) + ({m} - COUNT(*)) AS s,
         {m} - COUNT(*) AS v_zero,
         CAST(SUM(idx * rho) AS BIGINT) AS checksum
  FROM regs {gby}
),
est AS (
  SELECT {gsel}v_zero, checksum,
         CASE WHEN (CAST({cfg.alpha_m!r} AS DOUBLE) * {m} * {m} / s) <= 2.5 * {m} AND v_zero > 0
              THEN {m} * ln({m}::DOUBLE / v_zero)
              ELSE CAST({cfg.alpha_m!r} AS DOUBLE) * {m} * {m} / s END AS estimate
  FROM agg
)
SELECT {gsel}{SIG6_SQL.format(x='estimate')} AS est_m6, v_zero, checksum
FROM est
"""


def _hll_spark(
    spark: SparkSession, sf_dir: str, table: str, value: str, group: str | None
) -> DataFrame:
    df = read_table(spark, sf_dir, table)
    out = ops.hll_estimate(df, value, HLL_CFG, group_cols=(group,) if group else ())
    cols = [group] if group else []
    return out.select(
        *cols, sig6_mantissa(F.col("estimate")).alias("est_m6"), "v_zero", "checksum"
    )


# ---------------------------------------------------------------------------
# CMS: heavy-hitter part keys
# ---------------------------------------------------------------------------

def _cms_lin_union(table: str, value: str, cfg: CMSConfig) -> str:
    """UNION ALL of the d per-row hashed cell streams."""
    parts = [
        f"SELECT {i} AS row, {hash_sql(value, a, b)} % {cfg.width} AS col "
        f"FROM {table} WHERE {value} IS NOT NULL"
        for i, (a, b) in enumerate(cfg.hash_abs)
    ]
    return " UNION ALL ".join(parts)


def _cms_hh_oracle_sql(table: str, value: str, phi: float) -> str:
    cfg = CMS_CFG
    return f"""
WITH counters AS (
  SELECT row, col, COUNT(*) AS cnt
  FROM ({_cms_lin_union(table, value, cfg)}) GROUP BY row, col
),
n AS (SELECT COUNT({value}) AS n FROM {table}),
probes AS (SELECT DISTINCT {value} AS item FROM {table} WHERE {value} IS NOT NULL),
pcells AS (
  {' UNION ALL '.join(
      f"SELECT item, {i} AS row, {hash_sql('item', a, b)} % {cfg.width} AS col FROM probes"
      for i, (a, b) in enumerate(cfg.hash_abs)
  )}
),
est AS (
  SELECT p.item, MIN(COALESCE(c.cnt, 0)) AS est
  FROM pcells p LEFT JOIN counters c ON p.row = c.row AND p.col = c.col
  GROUP BY p.item
)
SELECT item, est FROM est, n WHERE est >= CAST({phi!r} AS DOUBLE) * n.n
"""


def _cms_hh_spark(
    spark: SparkSession, sf_dir: str, table: str, value: str, phi: float
) -> DataFrame:
    df = read_table(spark, sf_dir, table)
    return ops.cms_heavy_hitters(df, value, phi, CMS_CFG)


# ---------------------------------------------------------------------------
# Bloom: membership of probe keys against the lineitem partkey set
# ---------------------------------------------------------------------------

_N_BLOOM_PROBES = 3000


def _bloom_oracle_sql(table: str, value: str, n_probes: int = _N_BLOOM_PROBES) -> str:
    cfg = BLOOM_CFG
    exprs = ", ".join(hash_sql(value, a, b) for a, b in cfg.hash_abs)
    pexprs = ", ".join(hash_sql("probe", a, b) for a, b in cfg.hash_abs)
    return f"""
WITH lin AS (
  SELECT UNNEST([{exprs}]) AS h FROM {table} WHERE {value} IS NOT NULL
),
bits AS (SELECT DISTINCT {mix_sql('h')} % {cfg.m_bits} AS bit FROM lin),
probes AS (SELECT UNNEST(range(0, {n_probes})) AS probe),
plin AS (SELECT probe, UNNEST([{pexprs}]) AS h FROM probes),
pbits AS (SELECT probe, {mix_sql('h')} % {cfg.m_bits} AS bit FROM plin)
SELECT p.probe AS probe, COUNT(*) = COUNT(b.bit) AS might_contain
FROM pbits p LEFT JOIN bits b ON p.bit = b.bit
GROUP BY p.probe
"""


def _bloom_spark(spark: SparkSession, sf_dir: str, table: str, value: str) -> DataFrame:
    df = read_table(spark, sf_dir, table)
    probes = spark.range(0, _N_BLOOM_PROBES).select(F.col("id").alias("probe"))
    return ops.bloom_might_contain(df, value, probes, "probe", BLOOM_CFG)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _tdigest_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_spark.operators import quantile_agg as qa

    li = read_table(spark, sf_dir, "lineitem")
    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    return qa.quantiles(li, "l_extendedprice", qa.tdigest_ops(), qs)


def _kll_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_spark.operators import quantile_agg as qa

    ev = read_table(spark, sf_dir, "events")
    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    return qa.quantiles(ev, "value", qa.kll_ops(), qs, group_cols=("event_type",))


# ---------------------------------------------------------------------------
# t-digest / KLL exactness-tier queries (VERDICT r1 item 8)
#
# Both sketches have a provable EXACT regime: KLL never compacts while the
# per-group item count stays below k (level-0 capacity), and the merging
# t-digest keeps every centroid a distinct input value while each greedy
# step crosses the k-limit (guaranteed for per-group n < delta/pi at the k1
# scale function, since delta-k per fold >= (delta/pi) * 2/n > 1). The
# documents-by-source table (25 rows/group at oracle scale) sits inside
# both regimes, so these two queries get value-level SQL oracles (order
# statistic / midpoint interpolation) that exercise the full two-stage
# Spark pipeline (mapInPandas partials -> canonical merge -> evaluate).
# The price/events variants above stay rows-only and cover the compacting
# regime via the pytest rank-error gates.
# ---------------------------------------------------------------------------

_EXACT_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
_EXACT_QS_SQL = ", ".join(f"CAST({q} AS DOUBLE)" for q in _EXACT_QS)


def _tdigest_exact_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_spark.operators import quantile_agg as qa

    docs = read_table(spark, sf_dir, "documents")
    out = qa.quantiles(docs, "n_chars", qa.tdigest_ops(), _EXACT_QS, group_cols=("source",))
    return out.select(
        "source", "q", sig6_mantissa(F.col("estimate")).alias("est_m6"), "n"
    )


def _kll_exact_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_spark.operators import quantile_agg as qa

    docs = read_table(spark, sf_dir, "documents")
    out = qa.quantiles(docs, "n_chars", qa.kll_ops(), _EXACT_QS, group_cols=("source",))
    return out.select(
        "source", "q", sig6_mantissa(F.col("estimate")).alias("est_m6"), "n"
    )


def _kll_exact_oracle_sql() -> str:
    """KLL with no compaction = the order statistic at floor(q*(n-1))+1
    (1-based), mirroring core.kll.quantile's cumulative-weight walk."""
    return f"""
WITH v AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
r AS (SELECT source, x,
        row_number() OVER (PARTITION BY source ORDER BY x) AS rk,
        CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM v),
qs AS (SELECT DISTINCT source, UNNEST([{_EXACT_QS_SQL}]) AS q FROM v)
SELECT qs.source, qs.q AS q, {SIG6_SQL.format(x='r.x')} AS est_m6, r.n AS n
FROM qs JOIN r ON r.source = qs.source
 AND r.rk = CAST(floor(qs.q * (r.n - 1)) AS BIGINT) + 1
"""


def _tdigest_exact_oracle_sql() -> str:
    """Singleton-centroid t-digest quantile: midpoint interpolation over the
    sorted (value, count) centroids, clamped to min/max at the tails --
    term-for-term the same float64 expression as core.tdigest.quantile."""
    return f"""
WITH v AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
g AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS w FROM v GROUP BY 1, 2),
r AS (SELECT source, x, w,
        CAST(SUM(w) OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS cum,
        CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM g),
m AS (SELECT source, x, w, n, cum - w / 2.0 AS mid,
        LAG(x) OVER (PARTITION BY source ORDER BY x) AS px,
        LAG(cum - w / 2.0) OVER (PARTITION BY source ORDER BY x) AS pmid
      FROM r),
agg AS (SELECT source, MIN(x) AS mn, MAX(x) AS mx, MAX(n) AS n,
               MIN(mid) AS fmid, MAX(mid) AS lmid,
               MIN(x) AS fmean, MAX(x) AS lmean
        FROM m GROUP BY source),
t AS (SELECT qs.source, qs.q, qs.q * a.n AS tgt,
             a.mn, a.mx, a.n, a.fmid, a.lmid, a.fmean, a.lmean
      FROM (SELECT DISTINCT source, UNNEST([{_EXACT_QS_SQL}]) AS q FROM v) qs
      JOIN agg a ON a.source = qs.source),
est AS (
  SELECT source, q, n,
    CASE WHEN tgt <= fmid THEN mn + (tgt / fmid) * (fmean - mn)
         WHEN tgt >= lmid THEN
           lmean + (CASE WHEN n - lmid > 0 THEN (tgt - lmid) / (n - lmid) ELSE 0.0 END) * (mx - lmean)
         ELSE (SELECT m.px + ((t.tgt - m.pmid) / (m.mid - m.pmid)) * (m.x - m.px)
               FROM m WHERE m.source = t.source AND m.mid > t.tgt
               ORDER BY m.mid LIMIT 1)
    END AS estimate
  FROM t)
SELECT source, q, {SIG6_SQL.format(x='estimate')} AS est_m6, n FROM est
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # rows-only driver checks (no SQL oracle: compaction is partition-
        # order dependent within the rank bound; accuracy gated in pytest)
        "tdigest_quantiles_price": _tdigest_spark,
        "kll_quantiles_events_by_type": _kll_spark,
        # exactness-tier variants WITH value-level oracles (see block above)
        "tdigest_quantiles_nchars_by_source": _tdigest_exact_spark,
        "kll_quantiles_nchars_by_source": _kll_exact_spark,
        "hll_distinct_users_by_type": lambda s, d: _hll_spark(
            s, d, "events", "user_id", "event_type"
        ),
        "hll_distinct_parts_global": lambda s, d: _hll_spark(
            s, d, "lineitem", "l_partkey", None
        ),
        "cms_heavy_hitter_parts": lambda s, d: _cms_hh_spark(
            s, d, "lineitem", "l_partkey", 0.0008
        ),
        "bloom_membership_partkeys": lambda s, d: _bloom_spark(
            s, d, "lineitem", "l_partkey"
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tdigest_quantiles_nchars_by_source": _tdigest_exact_oracle_sql(),
        "kll_quantiles_nchars_by_source": _kll_exact_oracle_sql(),
        "hll_distinct_users_by_type": _hll_oracle_sql("events", "user_id", "event_type"),
        "hll_distinct_parts_global": _hll_oracle_sql("lineitem", "l_partkey", None),
        "cms_heavy_hitter_parts": _cms_hh_oracle_sql("lineitem", "l_partkey", 0.0008),
        "bloom_membership_partkeys": _bloom_oracle_sql("lineitem", "l_partkey"),
    }
