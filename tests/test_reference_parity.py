"""Bit-exact parity vs the COMPILED reference implementation.

Builds /root/reference/ddsketch.cc (unmodified, linked by our own test
driver tests/ref_oracle/driver.cpp) and compares: stored bins, n, adapted
alpha, and the full quantile grid, for build / merge / delete across the six
harness distributions and all three collapse strategies. Skipped cleanly if
no C++ toolchain is available.
"""

from __future__ import annotations

import math
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ddsketch_spark.config import FIRST, GAMMA2, LAST, DDSketchConfig
from ddsketch_spark.core import ddsketch as dds
from tests.reference_oracle import reference_streams

REF = Path("/root/reference")
DRIVER = Path(__file__).parent / "ref_oracle" / "driver.cpp"
BIN = Path("/tmp/ddsketch_ref_oracle")

COLLAPSE_ID = {GAMMA2: 1, LAST: 2, FIRST: 3}


@pytest.fixture(scope="module")
def oracle():
    if shutil.which("g++") is None or not REF.exists():
        pytest.skip("no g++ or reference sources; parity suite skipped")
    if not BIN.exists() or BIN.stat().st_mtime < DRIVER.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-std=c++14", f"-I{REF}", str(DRIVER),
             str(REF / "ddsketch.cc"), str(REF / "error.cpp"), "-o", str(BIN)],
            check=True, capture_output=True,
        )
    def run(collapse: str, bin_limit: int, alpha: float, values: np.ndarray, mode: str, *extra: str):
        vf = Path("/tmp/ref_oracle_vals.txt")
        np.savetxt(vf, values, fmt="%.17g")
        out = subprocess.run(
            [str(BIN), str(COLLAPSE_ID[collapse]), str(bin_limit), repr(alpha), str(vf), mode, *extra],
            check=True, capture_output=True, text=True,
        ).stdout
        res = {"bins": {}, "quantiles": {}, "n": None, "alpha": None, "size": None}
        for line in out.splitlines():
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "N":
                res["n"] = int(parts[1])
            elif parts[0] == "ALPHA":
                res["alpha"] = float(parts[1])
            elif parts[0] == "BIN":
                res["bins"][int(parts[1])] = int(parts[2])
            elif parts[0] == "Q":
                res["quantiles"][float(parts[1])] = float(parts[2])
            elif parts[0] == "SIZE":
                res["size"] = int(parts[1])
        return res
    return run


def my_build(collapse, bin_limit, alpha, values, sequential=False):
    sk = dds.empty(DDSketchConfig(bin_limit=bin_limit, alpha=alpha, collapse=collapse))
    if sequential:
        for x in values:
            dds.add_one(sk, float(x))
    else:
        dds.add(sk, values)
    return sk


def assert_state_matches(sk, ref, check_quantiles=True):
    assert sk.n == ref["n"]
    assert math.isclose(sk.alpha, ref["alpha"], rel_tol=1e-12)
    mine = {int(k): int(c) for k, c in zip(sk.keys, sk.counts)}
    assert mine == ref["bins"]
    if check_quantiles and ref["quantiles"]:
        for q, ref_est in ref["quantiles"].items():
            assert dds.quantile(sk, q) == pytest.approx(ref_est, rel=1e-12), q


NAMES = list(reference_streams(10).keys())


@pytest.mark.parametrize("name", NAMES)
def test_build_parity_gamma2(oracle, name):
    vals = reference_streams(8000)[name]
    ref = oracle(GAMMA2, 500, 0.008, vals, "build")
    assert_state_matches(my_build(GAMMA2, 500, 0.008, vals), ref)


@pytest.mark.parametrize("name", ["uniform_wide", "exponential_17"])
def test_build_parity_gamma2_collapse_pressure(oracle, name):
    vals = reference_streams(8000)[name]
    ref = oracle(GAMMA2, 100, 0.008, vals, "build")
    assert_state_matches(my_build(GAMMA2, 100, 0.008, vals), ref)


@pytest.mark.parametrize("collapse", [LAST, FIRST])
@pytest.mark.parametrize("name", ["uniform_wide", "normal_2_3"])
def test_build_parity_last_first_sequential(oracle, collapse, name):
    # per-item eager fold timing -> compare against add_one path
    vals = reference_streams(3000)[name]
    ref = oracle(collapse, 100, 0.008, vals, "build")
    sk = my_build(collapse, 100, 0.008, vals, sequential=True)
    assert_state_matches(sk, ref)


@pytest.mark.parametrize("name", NAMES)
def test_merge_parity_gamma2(oracle, name):
    vals = reference_streams(8000)[name]
    ref = oracle(GAMMA2, 120, 0.008, vals, "merge")
    h = len(vals) // 2
    a = my_build(GAMMA2, 120, 0.008, vals[:h])
    b = my_build(GAMMA2, 120, 0.008, vals[h:])
    merged = dds.merge(a, b)
    assert_state_matches(merged, ref)


def test_merge_parity_mixed_distributions(oracle):
    s = reference_streams(6000)
    vals = np.concatenate([s["normal_2_3"], s["uniform_wide"]])
    ref = oracle(GAMMA2, 150, 0.008, vals, "merge")
    h = len(vals) // 2
    a = my_build(GAMMA2, 150, 0.008, vals[:h])
    b = my_build(GAMMA2, 150, 0.008, vals[h:])
    assert_state_matches(dds.merge(a, b), ref)


@pytest.mark.parametrize("collapse", [LAST, FIRST])
def test_merge_parity_last_first(oracle, collapse):
    vals = reference_streams(3000)["uniform_wide"]
    ref = oracle(collapse, 100, 0.008, vals, "merge")
    h = len(vals) // 2
    a = my_build(collapse, 100, 0.008, vals[:h], sequential=True)
    b = my_build(collapse, 100, 0.008, vals[h:], sequential=True)
    merged = dds.merge(a, b)
    assert_state_matches(merged, ref, check_quantiles=False)


@pytest.mark.parametrize("name", ["normal_2_3", "gamma_2_2", "uniform_neg"])
def test_delete_parity_gamma2(oracle, name):
    vals = reference_streams(5000)[name]
    ref = oracle(GAMMA2, 500, 0.008, vals, "delete")
    sk = my_build(GAMMA2, 500, 0.008, vals)
    dds.delete(sk, vals)
    assert sk.n == ref["n"]
    assert sk.size == ref["size"]


def test_csv_bounds_parity_including_negatives(oracle, spark):
    """bins_df reproduces DDS_PrintCSV's (key, count, max, min, length)
    bin-for-bin on a MIXED-SIGN stream (ADVICE r1: negative-key min was
    one gamma step off, making min > max for every negative bucket)."""
    import csv as csv_mod

    from ddsketch_spark.operators import ddsketch_agg as agg
    from ddsketch_spark.sources.csv_source import bins_df

    vals = reference_streams(4000)["normal_2_3"]  # both signs present
    assert (vals < 0).any() and (vals > 0).any()
    out = Path("/tmp/ref_oracle_bins.csv")
    if out.exists():
        out.unlink()
    oracle(GAMMA2, 4096, 0.008, vals, "csv", str(out))

    # the CSV's key column is offset-STRIPPED, which is ambiguous (a tiny
    # positive value and a negative value can share a stripped key), so
    # compare the two outputs as sorted row multisets, not key-indexed
    ref_rows = []
    with out.open() as fh:
        rd = csv_mod.reader(fh)
        next(rd)  # header
        for row in rd:
            if len(row) < 5:
                continue
            ref_rows.append(
                (int(row[0]),) + tuple(round(float(c), 7) for c in row[1:5])
            )

    cfg = DDSketchConfig(bin_limit=4096, alpha=0.008)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    mine = [
        (r["key"], round(r["count"], 7), round(r["max"], 7),
         round(r["min"], 7), round(r["length"], 7))
        for r in bins_df(agg.sketch(df, "v", cfg), cfg).collect()
    ]
    assert len(mine) == len(ref_rows)
    for got, want in zip(sorted(mine), sorted(ref_rows)):
        assert got[0] == want[0] and got[1] == want[1], (got, want)
        for gi, wi in zip(got[2:], want[2:]):
            assert math.isclose(gi, wi, abs_tol=2e-7), (got, want)
    # every bucket of a negative VALUE has min one gamma step below max
    for key, cnt, mx, mn, ln in mine:
        if mx < 0:
            assert mn < mx < 0, (key, mn, mx)


@pytest.mark.parametrize("alphas", [(0.008, 0.01605), (0.004, 0.008), (0.0159, 0.008)])
def test_merge_parity_cross_alpha(oracle, alphas):
    """Cross-config merge: sketches built at DIFFERENT alphas, aligned by
    the reference's |a1-a2|<=1e-4 collapse loop (ddsketch.cc:583-595) and
    then added raw -- bin-for-bin + quantile-grid parity (r1 gap: the repo
    previously rejected cross-alpha merges outright)."""
    a1, a2 = alphas
    vals = reference_streams(6000)["normal_10_3"]
    ref = oracle(GAMMA2, 500, a1, vals, "mergeab", repr(a2))
    h = len(vals) // 2
    sa = my_build(GAMMA2, 500, a1, vals[:h])
    sb = my_build(GAMMA2, 500, a2, vals[h:])
    merged = dds.merge(sa, sb)
    assert_state_matches(merged, ref)
