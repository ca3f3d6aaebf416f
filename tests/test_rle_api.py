"""API-surface tests for Rle parity: ufunc hook, UDF hooks, comparisons,
numbers_only, getitem dispatch — mirroring the reference's doctest specs."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given
from hypothesis import strategies as st

from tokrle.kernels import rle as K
from tokrle.rle import Rle

pair = st.tuples(
    st.lists(st.integers(1, 20), min_size=1, max_size=10),
    st.lists(st.integers(-50, 50), min_size=1, max_size=10),
).map(lambda t: (np.array(t[0][: min(len(t[0]), len(t[1]))], dtype=np.int64),
                 np.array(t[1][: min(len(t[0]), len(t[1]))], dtype=np.float64)))


@given(pair, pair, st.sampled_from(["eq", "ne", "ge", "gt", "le", "lt"]))
def test_all_comparisons_vs_dense(a, b, cmp):
    r, v = K.rle_compare(a[0], a[1], b[0], b[1], cmp)
    d1 = np.repeat(a[1], a[0])
    d2 = np.repeat(b[1], b[0])
    n = max(len(d1), len(d2))
    fill = np.nan if cmp in ("eq", "ne") else 0.0
    d1 = np.concatenate([d1, np.full(n - len(d1), fill)])
    d2 = np.concatenate([d2, np.full(n - len(d2), fill)])
    diff = d1 - d2
    with np.errstate(invalid="ignore"):
        expected = {
            "eq": diff == 0, "ne": diff != 0, "ge": diff >= 0,
            "gt": diff > 0, "le": diff <= 0, "lt": diff < 0,
        }[cmp].astype(np.float64)
    assert np.allclose(np.repeat(v, r), expected)


def test_array_ufunc_applies_to_values_only():
    r = Rle(np.array([2, 3]), np.array([4.0, 9.0]))
    out = np.sqrt(r)
    assert isinstance(out, Rle)
    assert np.array_equal(out.runs, r.runs)
    assert np.allclose(out.values, [2.0, 3.0])


def test_apply_hooks():
    r = Rle(np.array([2, 3]), np.array([1.0, 2.0]))
    out = r.apply_values(lambda v: v * 10)
    assert np.allclose(out.values, [10.0, 20.0])
    out = r.apply_runs(lambda runs: runs * 2)
    assert np.array_equal(out.runs, [4, 6])
    assert out.length == 10
    out = r.apply(lambda rle: rle + 1)
    assert np.allclose(out.values, [2.0, 3.0])
    # defragment=True coalesces values that a UDF made equal
    out = r.apply_values(lambda v: np.zeros_like(v))
    assert len(out) == 1 and out.length == 5


def test_numbers_only():
    r = Rle(np.array([1, 1, 1, 1]),
            np.array([1.0, np.nan, np.inf, -np.inf]))
    out = r.numbers_only()
    assert np.array_equal(
        out.to_array(), [1.0, 0.0, 2147483647.0, -2147483648.0])


def test_defragment_normalizes_negative_zero():
    r = Rle.__new__(Rle)
    r.runs = np.array([2], dtype=np.int64)
    r.values = np.array([-0.0])
    out = r.defragment()
    assert not np.signbit(out.values[0])


def test_getitem_dispatch():
    r = Rle(np.array([2, 3]), np.array([1.0, 5.0]))
    assert r[0] == 1.0 and r[4] == 5.0
    assert r[100] == 0.0  # out of range -> 0 like the reference walk
    sub = r[1:4]
    assert np.allclose(sub.to_array(), [1.0, 5.0, 5.0])
    df = pd.DataFrame({"Start": [0, 3], "End": [3, 5]})
    out = r[df]
    assert list(out.columns) == ["Start", "End", "ID", "Run", "Value"]
    got0 = out[out.ID == 0]
    assert np.array_equal(np.repeat(got0.Value, got0.Run), [1.0, 1.0, 5.0])


def test_scalar_reflected_ops():
    r = Rle(np.array([2]), np.array([4.0]))
    assert np.allclose((10 - r).values, [6.0])
    assert np.allclose((8 / r).values, [2.0])
    assert np.allclose((-r).values, [-4.0])


def test_length_and_repr():
    r = Rle(np.array([2, 3]), np.array([1.0, 2.0]))
    assert r.length == 5 and len(r) == 2
    assert "Rle" in repr(r)


def test_construct_from_dense_casts_to_float64():
    r = Rle([1, 1, 2, 2, 2])
    assert r.values.dtype == np.float64
    assert np.array_equal(r.runs, [2, 3])
