"""Two-stage partial/merge sketch aggregation (the UDAF-shaped path).

This is the distributed pattern the reference simulates in-process
(testMergeWithRandomValue, main.cpp:467-629): per-partition partial sketches
built vectorized over Arrow batches (``mapInPandas``), then a canonical
N-way merge per group (``applyInPandas``). Compared to the JVM-histogram
path (operators.ddsketch_agg) this keeps *bounded per-partition state*
(bin_limit applies during the build, like the reference's eager collapse)
and emits per-partition lineage (partition id + input files) for
checkpoint/resume, at the cost of moving raw values across the Arrow
boundary once.

Scale notes:
- shuffle carries one ~KB sketch row per (partition x group), never data;
- skewed groups are irrelevant here (partials are uniform); a two-level
  tree merge (``fanout``) bounds the rows any single merge task sees;
- the token fast path turns array<int32> columns into value histograms with
  ``np.bincount`` before keying -- one log() per *distinct* token value
  rather than per token.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ddsketch_spark.config import DDSketchConfig
from ddsketch_spark.core import ddsketch as core
from ddsketch_spark.operators.ddsketch_agg import (
    SKETCH_STATE_FIELDS,
    _GLOBAL,
    _group_schema_prefix,
    _state_to_row,
)

_STATE_KEYS = (
    "alpha0", "level", "offset", "bin_limit", "collapse",
    "n", "min_key", "max_key", "keys", "counts",
)

_INT_FASTPATH_MAX = 1 << 22  # bincount table cap (~32 MB of int64)


def _batch_values(series: pd.Series, array_col: bool) -> np.ndarray:
    if not array_col:
        return series.to_numpy()
    arrs = [a for a in series if a is not None and len(a)]
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(arrs)


def _add_values(sk: core.DDSketch, vals: np.ndarray) -> None:
    vals = vals[~pd.isna(vals)] if vals.dtype == object else vals
    if vals.size == 0:
        return
    if np.issubdtype(vals.dtype, np.integer):
        vmin = vals.min()
        vmax = int(vals.max())
        if vmin >= 0 and vmax < _INT_FASTPATH_MAX:
            # one log() per DISTINCT value instead of per value. minlength +
            # int64 matter: np.bincount on int32 without minlength falls off
            # a fast path (~60x slower on skewed data).
            counts = np.bincount(
                vals.astype(np.int64, copy=False), minlength=vmax + 1
            )
            nz = np.nonzero(counts)[0]
            core.add_weighted(sk, nz.astype(np.float64), counts[nz])
            return
        vals = vals.astype(np.float64)
    else:
        vals = vals[~np.isnan(vals)]
    core.add(sk, vals)


def from_row(row) -> core.DDSketch:
    """Rehydrate a sketch from a state row (Spark Row / pandas row / dict)."""
    return core.from_dict({k: row[k] for k in _STATE_KEYS})


_STATE_ARROW_FIELDS = None


def _state_arrow_fields():
    global _STATE_ARROW_FIELDS
    if _STATE_ARROW_FIELDS is None:
        import pyarrow as pa

        _STATE_ARROW_FIELDS = [
            ("alpha0", pa.float64()),
            ("level", pa.int32()),
            ("offset", pa.int64()),
            ("bin_limit", pa.int32()),
            ("collapse", pa.string()),
            ("n", pa.int64()),
            ("min_key", pa.int64()),
            ("max_key", pa.int64()),
            ("keys", pa.list_(pa.int64())),
            ("counts", pa.list_(pa.int64())),
        ]
    return _STATE_ARROW_FIELDS


def rows_to_arrow_batch(rows: list[dict], group_fields, lineage: bool = False):
    """Build a mapInArrow output batch with exact, positionally-ordered
    schema: group columns first (typed from the input batch), then the
    canonical state fields, then optional lineage columns."""
    import pyarrow as pa

    fields = list(group_fields) + [pa.field(n, t) for n, t in _state_arrow_fields()]
    if lineage:
        fields += [
            pa.field("partition_id", pa.int32()),
            pa.field("input_files", pa.list_(pa.string())),
        ]
    schema = pa.schema(fields)
    cols = [
        pa.array([r[f.name] for r in rows], type=f.type) for f in schema
    ]
    return pa.RecordBatch.from_arrays(cols, schema=schema)


def _batch_group_values(batch, value: str, group_cols, array_col: bool):
    """Yield (group_key_tuple, values_ndarray) for one Arrow RecordBatch,
    fully vectorized: list columns flatten zero-copy; group dispatch is a
    factorize + boolean mask (np.repeat aligns flattened array elements with
    their row's group)."""
    import pyarrow as pa

    col = batch.column(batch.schema.get_field_index(value))
    if array_col:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if not group_cols:
            yield (), flat
            return
        import pyarrow.compute as pc

        sizes = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        sizes = np.nan_to_num(sizes, nan=0).astype(np.int64)
    else:
        vals = col.to_numpy(zero_copy_only=False)
        if not group_cols:
            yield (), vals
            return

    gseries = [batch.column(batch.schema.get_field_index(g)).to_pandas() for g in group_cols]
    if len(gseries) == 1:
        codes, uniques = pd.factorize(gseries[0], use_na_sentinel=False)
        keys = [(u,) for u in uniques]
    else:
        zipped = pd.Series(list(zip(*gseries)))
        codes, uniques = pd.factorize(zipped, use_na_sentinel=False)
        keys = list(uniques)
    if array_col:
        labels = np.repeat(codes, sizes)
        for gi, gkey in enumerate(keys):
            yield tuple(gkey), flat[labels == gi]
    else:
        for gi, gkey in enumerate(keys):
            yield tuple(gkey), vals[codes == gi]


class SketchMetrics:
    """Per-job accumulator bundle (north rule: sketch-size/throughput
    metrics). Updated inside the build UDF on every partition; read on the
    driver after an action."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.rows = sc.accumulator(0)
        self.values = sc.accumulator(0)
        self.sketch_bins = sc.accumulator(0)
        self.build_secs = sc.accumulator(0.0)

    def as_dict(self) -> dict:
        secs = max(self.build_secs.value, 1e-9)
        return {
            "rows": self.rows.value,
            "values": self.values.value,
            "sketch_bins": self.sketch_bins.value,
            "partition_build_secs": round(self.build_secs.value, 3),
            "values_per_cpu_sec": int(self.values.value / secs),
        }


def build_partials(
    df: DataFrame,
    value: str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    array_col: bool = False,
    with_lineage: bool = False,
    metrics: "SketchMetrics | None" = None,
) -> DataFrame:
    """One canonical sketch row per (input partition x group).

    Runs as ``mapInArrow``: token arrays flatten zero-copy from the Arrow
    batch (no per-row Python objects anywhere -- the input_hint requirement),
    and integer values take the bincount fast path in ``_add_values``.

    ``with_lineage`` adds ``partition_id`` and the distinct ``input_files``
    the partition consumed -- the resume key for plans.checkpoint.
    """
    cfg = cfg or DDSketchConfig()
    group_cols = list(group_cols)
    cols = group_cols + [value] + (["__file"] if with_lineage else [])
    src = df
    if with_lineage:
        src = src.withColumn("__file", F.input_file_name())
    src = src.select(*[F.col(c) for c in dict.fromkeys(cols)])

    out_schema = _group_schema_prefix(df, group_cols) + SKETCH_STATE_FIELDS
    if with_lineage:
        out_schema += ", partition_id int, input_files array<string>"

    def build(batches):
        import time as _time

        from pyspark import TaskContext

        t0 = _time.monotonic()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        n_rows = n_vals = 0
        sketches: dict[tuple, core.DDSketch] = {}
        files: set[str] = set()
        group_fields = None
        for batch in batches:
            if group_fields is None:
                group_fields = [batch.schema.field(g) for g in group_cols]
            n_rows += batch.num_rows
            if with_lineage:
                fcol = batch.column(batch.schema.get_field_index("__file"))
                files.update(fcol.unique().to_pylist())
            for gkey, vals in _batch_group_values(batch, value, group_cols, array_col):
                sk = sketches.get(gkey)
                if sk is None:
                    sk = sketches[gkey] = core.empty(cfg)
                n_vals += len(vals)
                _add_values(sk, vals)
        if metrics is not None:
            metrics.rows += n_rows
            metrics.values += n_vals
            metrics.sketch_bins += sum(s.size for s in sketches.values())
            metrics.build_secs += _time.monotonic() - t0
        rows = []
        for gkey, sk in sketches.items():
            row = _state_to_row(sk)
            for g, gv in zip(group_cols, gkey):
                row[g] = gv
            if with_lineage:
                row["partition_id"] = pid
                row["input_files"] = sorted(files)
            rows.append(row)
        if rows:
            yield rows_to_arrow_batch(rows, group_fields or [], with_lineage)

    return src.mapInArrow(build, schema=out_schema)


def _require_uniform_config(pdf: pd.DataFrame) -> None:
    """Reject mixed sketch configs inside a distributed merge task.

    ``core.merge_many`` falls back to the reference's pairwise tolerance
    loop for cross-alpha inputs (ddsketch.cc:583-595) -- an ORDER-DEPENDENT
    result.  Shuffle delivery order is nondeterministic, so a mixed-config
    merge here would be silently nondeterministic run-to-run.  Config is
    fixed per job by construction (one DDSketchConfig flows into
    build_partials); this guard pins that invariant with the reference's
    MergeError (-5) instead of letting the fallback run distributed.
    Cross-config merges remain available driver-side via core.merge/
    merge_many, where the caller controls the order."""
    for colname in ("alpha0", "offset", "bin_limit", "collapse"):
        vals = pdf[colname].unique()
        if len(vals) > 1:
            raise core.MergeError(
                f"mixed '{colname}' across partials in distributed merge: "
                f"{sorted(vals.tolist())} (reference error -5)"
            )


def merge_partials(
    partials: DataFrame,
    group_cols: Sequence[str] = (),
    fanout: int | None = None,
) -> DataFrame:
    """Canonical N-way merge per group (core.merge_many: lift to max level,
    sum, collapse-to-limit -- byte-identical under reordering).

    ``fanout``: optional two-level tree merge -- partials are first merged
    within ``fanout`` salted sub-groups, bounding the row count any single
    task materializes; exact because the merge is associative+commutative.
    """
    group_cols = list(group_cols)
    drop_global = False
    if not group_cols:
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        group_cols = [_GLOBAL]
        drop_global = True
    out_schema = _group_schema_prefix(partials, group_cols) + SKETCH_STATE_FIELDS

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        _require_uniform_config(pdf)
        sketches = [from_row(r) for _, r in pdf.iterrows()]
        merged = core.merge_many(sketches)
        row = _state_to_row(merged)
        for g in group_cols:
            row[g] = pdf[g].iloc[0]
        return pd.DataFrame([row])

    if fanout and fanout > 1:
        salted = partials.withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(fanout)).cast("int")
        )
        mid_schema = (
            _group_schema_prefix(partials, group_cols)
            + "__salt int, "
            + SKETCH_STATE_FIELDS
        )

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            _require_uniform_config(pdf)
            merged = core.merge_many([from_row(r) for _, r in pdf.iterrows()])
            row = _state_to_row(merged)
            for g in group_cols:
                row[g] = pdf[g].iloc[0]
            row["__salt"] = int(pdf["__salt"].iloc[0])
            return pd.DataFrame([row])

        mid = salted.groupBy(*group_cols, "__salt").applyInPandas(
            merge_salted, schema=mid_schema
        )
        out = mid.groupBy(*group_cols).applyInPandas(merge_fn, schema=out_schema)
    else:
        out = partials.groupBy(*group_cols).applyInPandas(merge_fn, schema=out_schema)
    if drop_global:
        out = out.drop(_GLOBAL)
    return out


def update_sketch_states(
    states: DataFrame,
    new_df: DataFrame,
    value: str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    array_col: bool = False,
    fanout: int | None = None,
) -> DataFrame:
    """Incremental sketch maintenance: fold NEW data into previously
    materialized per-group sketch states (e.g. yesterday's sketch table
    read back from parquet/Iceberg) WITHOUT rescanning the old data.

    Exact, not approximate-on-approximate: the canonical merge is
    associative and commutative (core.merge_many lifts to the max level,
    sums, collapses), so merge(stored states, partials(new data)) is
    byte-identical to rebuilding over old+new from scratch -- pinned by
    tests/test_sketch_udaf.py through a parquet round-trip. This is the
    operational pattern at 100 TB: the fact table is append-only, the
    sketch table is KBs per group, and a daily update touches only the new
    partition."""
    parts = build_partials(new_df, value, cfg, group_cols, array_col)
    cols = list(group_cols) + [f.split(" ")[0] for f in SKETCH_STATE_FIELDS.split(", ")]
    both = states.select(*cols).unionByName(parts.select(*cols))
    return merge_partials(both, group_cols, fanout)


def sketch_udaf(
    df: DataFrame,
    value: str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    array_col: bool = False,
    fanout: int | None = None,
    metrics: SketchMetrics | None = None,
) -> DataFrame:
    """values -> per-group canonical sketch states, UDAF-style."""
    parts = build_partials(df, value, cfg, group_cols, array_col, metrics=metrics)
    return merge_partials(parts, group_cols, fanout)
