"""Property-based tests (hypothesis) over the numpy sketch cores.

The reference's harness tests fixed distributions (SURVEY.md §5.1); these
extend the same oracles to adversarial random inputs: arbitrary finite
doubles, arbitrary partition splits, arbitrary merge orders.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ddsketch_spark.config import COLLAPSE_TYPES, DDSketchConfig
from ddsketch_spark.core import bloom, cms, ddsketch as dds, hll

finite_vals = st.lists(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ).filter(lambda v: v == 0.0 or abs(v) > 1e-12),
    min_size=1,
    max_size=400,
)


@given(vals=finite_vals, q=st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=150, deadline=None)
def test_quantile_alpha_guarantee(vals, q):
    """Every estimate within alpha of the exact order statistic at
    idx = floor(1 + q(n-1)) (reference oracle, main.cpp:971-976), for any
    finite input and any q -- gamma2 config, no collapse pressure."""
    cfg = DDSketchConfig(bin_limit=1 << 20)
    sk = dds.add(dds.empty(cfg), np.asarray(vals, dtype=np.float64))
    est = dds.quantile(sk, q)
    true = np.sort(np.asarray(vals))[min(int(q * (len(vals) - 1)), len(vals) - 1)]
    if true == 0.0:
        assert abs(est) <= 1e-12
    else:
        assert abs(est - true) / abs(true) <= cfg.alpha + 1e-12


@given(
    vals=finite_vals,
    cuts=st.lists(st.integers(min_value=0, max_value=399), max_size=6),
    collapse=st.sampled_from(COLLAPSE_TYPES),
)
@settings(max_examples=100, deadline=None)
def test_merge_partition_invariance(vals, cuts, collapse):
    """Canonical merge of ANY partitioning == single build (byte-identical
    state), including under collapse pressure."""
    cfg = DDSketchConfig(bin_limit=32, collapse=collapse)
    arr = np.asarray(vals, dtype=np.float64)
    idx = sorted({c % (len(arr) + 1) for c in cuts})
    parts = np.split(arr, idx)
    merged = dds.merge_many([dds.add(dds.empty(cfg), p) for p in parts])
    single = dds.merge_many([dds.add(dds.empty(cfg), arr)])
    assert dds.to_dict(merged) == dds.to_dict(single)


@given(vals=finite_vals, frac=st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=100, deadline=None)
def test_delete_complement(vals, frac):
    """Deleting an inserted subset leaves exactly the complement histogram
    (n decremented per deleted item, sum(counts) == n invariant)."""
    cfg = DDSketchConfig(bin_limit=1 << 20)
    arr = np.asarray(vals, dtype=np.float64)
    k = int(frac * len(arr))
    sk = dds.add(dds.empty(cfg), arr)
    dds.delete(sk, arr[:k])
    want = dds.add(dds.empty(cfg), arr[k:]) if k < len(arr) else dds.empty(cfg)
    assert sk.n == len(arr) - k
    assert int(sk.counts.sum()) == sk.n
    assert np.array_equal(sk.keys, want.keys)
    assert np.array_equal(sk.counts, want.counts)


ints = st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=300)


@given(xs=ints, cuts=st.lists(st.integers(min_value=0, max_value=299), max_size=4))
@settings(max_examples=75, deadline=None)
def test_hll_partition_invariance(xs, cuts):
    arr = np.asarray(xs, dtype=np.int64)
    idx = sorted({c % (len(arr) + 1) for c in cuts})
    parts = np.split(arr, idx)
    sketches = [hll.add(hll.empty(), p) for p in parts]
    merged = sketches[0]
    for s in sketches[1:]:
        merged = hll.merge(merged, s)
    single = hll.add(hll.empty(), arr)
    assert hll.to_dict(merged) == hll.to_dict(single)


@given(xs=ints)
@settings(max_examples=75, deadline=None)
def test_cms_point_never_undercounts(xs):
    arr = np.asarray(xs, dtype=np.int64)
    sk = cms.add(cms.empty(cms.CMSConfig(depth=3, width=64)), arr)
    items, counts = np.unique(arr, return_counts=True)
    assert np.all(cms.point_query(sk, items) >= counts)
    assert sk.n == len(arr)


@given(xs=ints)
@settings(max_examples=75, deadline=None)
def test_bloom_no_false_negatives_property(xs):
    arr = np.asarray(xs, dtype=np.int64)
    sk = bloom.add(bloom.empty(bloom.BloomConfig(m_bits=1 << 10, k=3)), arr)
    assert bool(np.all(bloom.might_contain(sk, arr)))
