"""Distributed DDSketch aggregation: the JVM-native histogram path.

Pipeline (replaces the reference's per-item insert loop + pairwise merges,
SURVEY.md §3.2-3.3):

  1. ``dds_key`` Catalyst expression keys every value JVM-side (codegen).
  2. ``groupBy(groups, key).count()`` builds per-group histograms with
     automatic map-side partial aggregation -- the only data-sized stage, and
     it shuffles at most (#groups x #bins) rows.
  3. One ``applyInPandas`` over the tiny per-group histograms runs the numpy
     core's collapse-to-limit + quantile walk. Fully distributed across
     groups; nothing data-sized ever reaches Python or the driver.

For the gamma^2 strategy this lazy build is provably identical to the
reference's eager per-item collapse (see core.ddsketch.add). For last/first
it matches the reference's bulk-merge path (ddsketch.cc:676-696).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ddsketch_spark.config import DDSketchConfig
from ddsketch_spark.core import ddsketch as core
from ddsketch_spark.functions.ddsketch_sql import dds_key, dds_strip_offset

# Canonical sketch-state row schema (SURVEY.md §1.4): sorted parallel arrays,
# not MapType, so equal sketches serialize identically (merge-algebra gate).
SKETCH_STATE_FIELDS = (
    "alpha0 double, level int, offset long, bin_limit int, collapse string, "
    "n long, min_key long, max_key long, keys array<long>, counts array<long>"
)

_GLOBAL = "__global_group"


def _state_to_row(sk: core.DDSketch) -> dict:
    d = core.to_dict(sk)
    d["alpha0"] = d.pop("alpha0")
    return d


def _sketch_from_hist(pdf_keys: np.ndarray, pdf_cnts: np.ndarray, cfg: DDSketchConfig) -> core.DDSketch:
    order = np.argsort(pdf_keys)
    sk = core.DDSketch(
        cfg=cfg,
        keys=pdf_keys[order].astype(np.int64),
        counts=pdf_cnts[order].astype(np.int64),
        n=int(pdf_cnts.sum()),
    )
    core._collapse_to_limit(sk)
    return sk


def histogram(
    df: DataFrame,
    value: Column | str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    explode_array: bool = False,
    weight: Column | str | None = None,
) -> DataFrame:
    """(group_cols..., key, cnt) level-0 bucket histogram.

    ``explode_array=True`` keys the elements of an array column (e.g.
    ``tokens``); the explode feeds straight into partial hash aggregation, so
    exploded rows never cross a shuffle.

    ``weight`` turns the count into an integer-weighted multiplicity (the
    core's add_weighted semantics: each row contributes `weight` items).
    """
    cfg = cfg or DDSketchConfig()
    v = F.col(value) if isinstance(value, str) else value
    w = (F.col(weight) if isinstance(weight, str) else weight) if weight is not None else None
    if explode_array:
        # generators can't nest inside expressions; explode first, then key
        cols = [*group_cols] + ([w.alias("__w")] if w is not None else [])
        df = df.select(*cols, F.explode(v).alias("__elem"))
        v = F.col("__elem")
        if w is not None:
            w = F.col("__w")
    sel = [*group_cols, dds_key(v, cfg).alias("key")]
    if w is not None:
        sel.append(w.cast("long").alias("__w"))
    keyed = df.select(*sel).where(F.col("key").isNotNull())
    cnt = F.sum("__w") if w is not None else F.count(F.lit(1))
    return keyed.groupBy(*group_cols, "key").agg(cnt.alias("cnt"))


def _group_schema_prefix(df: DataFrame, group_cols) -> str:
    """Schema fragment for the group columns, typed from the input plan."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return "".join(f"{g} {types[g]}, " for g in group_cols)


def _grouped(hist: DataFrame, group_cols: Sequence[str]):
    if group_cols:
        return hist.groupBy(*group_cols), list(group_cols), hist
    h = hist.withColumn(_GLOBAL, F.lit(1))
    return h.groupBy(_GLOBAL), [_GLOBAL], h


def sketch_from_histogram(
    hist: DataFrame,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Finalize per-group histograms into canonical sketch-state rows."""
    cfg = cfg or DDSketchConfig()
    grouped, keys, _ = _grouped(hist, group_cols)
    out_schema = _group_schema_prefix(hist, group_cols) + SKETCH_STATE_FIELDS

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = _sketch_from_hist(pdf["key"].to_numpy(), pdf["cnt"].to_numpy(), cfg)
        row = _state_to_row(sk)
        for g in group_cols:
            row[g] = pdf[g].iloc[0]
        return pd.DataFrame([row])

    out = grouped.applyInPandas(finalize, schema=out_schema)
    return out


def sketch(
    df: DataFrame,
    value: Column | str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    explode_array: bool = False,
) -> DataFrame:
    """End-to-end: values -> per-group canonical sketch states."""
    cfg = cfg or DDSketchConfig()
    return sketch_from_histogram(
        histogram(df, value, cfg, group_cols, explode_array), cfg, group_cols
    )


def quantiles(
    df: DataFrame,
    value: Column | str,
    qs: Sequence[float],
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
    explode_array: bool = False,
    weight: Column | str | None = None,
) -> DataFrame:
    """(group_cols..., q, bucket_key, estimate, n) quantile estimates.

    ``bucket_key`` is the offset-stripped key of the selected bucket (an
    exact integer -- the strongest oracle-comparable signal); ``estimate`` is
    the reference's midpoint estimator for that bucket.
    """
    cfg = cfg or DDSketchConfig()
    qs = [float(q) for q in qs]
    hist = histogram(df, value, cfg, group_cols, explode_array, weight)
    grouped, keys, _ = _grouped(hist, group_cols)
    out_schema = (
        _group_schema_prefix(hist, group_cols)
        + "q double, bucket_key long, estimate double, n long"
    )
    off = cfg.offset

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = _sketch_from_hist(pdf["key"].to_numpy(), pdf["cnt"].to_numpy(), cfg)
        ests = core.quantiles(sk, qs)
        cum = np.cumsum(sk.counts)
        stops = np.asarray(qs) * float(sk.n - 1)
        idx = np.minimum(np.searchsorted(cum, stops, side="right"), sk.size - 1)
        sel = sk.keys[idx]
        stripped = np.where(sel > 0, sel - off, np.where(sel < 0, sel + off, 0))
        out = pd.DataFrame(
            {"q": qs, "bucket_key": stripped, "estimate": ests, "n": sk.n}
        )
        for g in group_cols:
            out[g] = pdf[g].iloc[0]
        return out

    return grouped.applyInPandas(finalize, schema=out_schema)


def delete_from_sketch(
    sketch_df: DataFrame,
    delete_df: DataFrame,
    value: Column | str,
    cfg: DDSketchConfig | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Distributed turnstile delete: reduce the deletion multiset to a
    per-group (key, cnt) histogram JVM-side, cogroup it with the sketch rows,
    and apply the core's min(c,m) delete per group
    (reference: DDS_DeleteCollapse*, ddsketch.cc:342-517)."""
    cfg = cfg or DDSketchConfig()
    del_hist = histogram(delete_df, value, cfg, group_cols)
    if not group_cols:
        sketch_g = sketch_df.withColumn(_GLOBAL, F.lit(1)).groupby(_GLOBAL)
        del_g = del_hist.withColumn(_GLOBAL, F.lit(1)).groupby(_GLOBAL)
    else:
        sketch_g = sketch_df.groupby(*group_cols)
        del_g = del_hist.groupby(*group_cols)
    out_schema = _group_schema_prefix(sketch_df, group_cols) + SKETCH_STATE_FIELDS

    def apply_delete(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame()
        sk = core.from_dict(
            {k: left[k].iloc[0] for k in (
                "alpha0", "level", "offset", "bin_limit", "collapse",
                "n", "min_key", "max_key", "keys", "counts")}
        )
        if len(right) > 0:
            core.delete_keyed(
                sk, right["key"].to_numpy(), right["cnt"].to_numpy(), keys_level=0
            )
        row = _state_to_row(sk)
        for g in group_cols:
            row[g] = left[g].iloc[0]
        return pd.DataFrame([row])

    return sketch_g.cogroup(del_g).applyInPandas(apply_delete, schema=out_schema)


def quantiles_from_sketch(
    sketch_df: DataFrame, qs: Sequence[float], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Evaluate the quantile grid from persisted sketch-state rows."""
    qs = [float(q) for q in qs]
    out_schema = (
        _group_schema_prefix(sketch_df, group_cols)
        + "q double, bucket_key long, estimate double, n long"
    )

    def per_row(iterator):
        for pdf in iterator:
            outs = []
            for _, r in pdf.iterrows():
                sk = core.from_dict(
                    {k: r[k] for k in (
                        "alpha0", "level", "offset", "bin_limit", "collapse",
                        "n", "min_key", "max_key", "keys", "counts")}
                )
                ests = core.quantiles(sk, qs)
                cum = np.cumsum(sk.counts)
                stops = np.asarray(qs) * float(sk.n - 1)
                idx = np.minimum(np.searchsorted(cum, stops, side="right"), sk.size - 1)
                sel = sk.keys[idx]
                off = sk.cfg.offset
                stripped = np.where(sel > 0, sel - off, np.where(sel < 0, sel + off, 0))
                out = pd.DataFrame(
                    {"q": qs, "bucket_key": stripped, "estimate": ests, "n": sk.n}
                )
                for g in group_cols:
                    out[g] = r[g]
                outs.append(out)
            if outs:
                yield pd.concat(outs)

    return sketch_df.mapInPandas(per_row, schema=out_schema)
