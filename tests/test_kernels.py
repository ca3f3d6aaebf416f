"""Hypothesis property tests for the RLE kernels vs a dense NumPy oracle.

Mirrors the reference's test strategy (reference tests/test_hypothesis.py):
random (runs, values) pairs -> arithmetic -> compare against the trivial
dense oracle (repeat -> op -> find_runs -> canonicalize), plus the
commutativity and inverse property families.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokrle.kernels import rle as K
from tokrle.rle import Rle

# strategies mirroring reference tests/hypothesis_helper.py:25-33 (runs up to
# large values, integer run values) but with lengths kept testable
runs_st = st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20)
values_st = st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=20)


@st.composite
def rle_pair(draw):
    r = draw(runs_st)
    v = draw(values_st.filter(lambda x: True))
    n = min(len(r), len(v))
    return np.array(r[:n], dtype=np.int64), np.array(v[:n], dtype=np.float64)


def dense_oracle_binop(r1, v1, r2, v2, op):
    """repeat -> op (zero-padded) -> find_runs -> canonicalize."""
    d1 = np.repeat(v1, r1)
    d2 = np.repeat(v2, r2)
    n = max(len(d1), len(d2))
    d1 = np.pad(d1, (0, n - len(d1)))
    d2 = np.pad(d2, (0, n - len(d2)))
    with np.errstate(divide="ignore", invalid="ignore"):
        dense = op(d1, d2)
    runs, vals = K.rle_encode(dense)
    return K.canonicalize(runs, vals.astype(np.float64))


def assert_rle_equal(got, expected):
    gr, gv = got
    er, ev = expected
    assert np.array_equal(gr, er), f"runs differ: {gr} vs {er}"
    assert np.allclose(gv, ev, equal_nan=True), f"values differ: {gv} vs {ev}"


@given(rle_pair())
def test_encode_decode_roundtrip(pair):
    r, v = pair
    dense = np.repeat(v, r)
    er, ev = K.rle_encode(dense)
    assert np.array_equal(np.repeat(ev, er), dense)
    # canonical: no adjacent equal values, no zero runs
    assert (er > 0).all()
    if len(ev) > 1:
        assert (ev[1:] != ev[:-1]).all()


@settings(max_examples=200)
@given(rle_pair(), rle_pair())
@pytest.mark.parametrize(
    "kernel,op",
    [
        (K.rle_add, np.add),
        (K.rle_sub, np.subtract),
        (K.rle_mul, np.multiply),
    ],
)
def test_binop_vs_dense_oracle(kernel, op, a, b):
    got = kernel(a[0], a[1], b[0], b[1])
    expected = dense_oracle_binop(a[0], a[1], b[0], b[1], op)
    assert_rle_equal(got, expected)


@settings(max_examples=200)
@given(rle_pair(), rle_pair())
def test_div_vs_dense_oracle(a, b):
    got = K.rle_div(a[0], a[1], b[0], b[1])
    expected = dense_oracle_binop(a[0], a[1], b[0], b[1], np.true_divide)
    assert_rle_equal(got, expected)


@given(rle_pair(), rle_pair())
def test_commutative(a, b):
    """a+b == b+a, a*b == b*a (reference tests/test_hypothesis.py:91-113)."""
    x = Rle(*a)
    y = Rle(*b)
    assert (x + y).equal(y + x)
    assert (x * y).equal(y * x)


@given(rle_pair(), rle_pair())
def test_inverse_add_sub(a, b):
    """(a + b) - b == a (reference tests/test_hypothesis.py:151-170)."""
    x = Rle(*a)
    y = Rle(*b)
    got = (x + y) - y
    # may have a trailing zero-run if y was longer; slice to x's length
    got = got[: x.length]
    assert np.allclose(got.to_array(), x.to_array())


@given(rle_pair())
def test_inverse_div_mul(a):
    """(a / b) * b == a for positive values (ref tests/test_hypothesis.py:116-148)."""
    r, v = a
    v = np.abs(v) + 1.0
    b_r = np.array([int(r.sum())])
    b_v = np.array([3.0])
    x = Rle(r, v)
    y = Rle(b_r, b_v)
    got = (x / y) * y
    assert np.allclose(got.to_array(), x.to_array())


def test_canonicalize_reference_semantics():
    # zero runs dropped (ref pyrle/rle.py:150-153)
    r, v = K.canonicalize(np.array([1, 0, 2]), np.array([1.0, 5.0, 1.0]))
    assert list(r) == [3] and list(v) == [1.0]
    # approx coalesce keeps the group leader's value (coverage.pyx:115-137)
    r, v = K.canonicalize(np.array([1, 1]), np.array([2.0, 2.0 + 5e-6]))
    assert list(r) == [2] and v[0] == 2.0
    # no trigger -> no merge even for abs-close pair that isn't isclose
    r, v = K.canonicalize(np.array([1, 1]), np.array([0.0, 9e-6]))
    assert len(r) == 2
    # ... but any triggering pair turns on merging for the whole array
    r, v = K.canonicalize(
        np.array([1, 1, 1, 1]), np.array([5.0, 5.0, 0.0, 9e-6]))
    assert list(r) == [2, 2] and list(v) == [5.0, 0.0]
    # NaN runs merge (coverage.pyx:120-122)
    r, v = K.canonicalize(np.array([1, 1]), np.array([np.nan, np.nan]))
    assert list(r) == [2] and np.isnan(v[0])
    # matching infinities merge (coverage.pyx:123-125)
    r, v = K.canonicalize(np.array([1, 1]), np.array([np.inf, np.inf]))
    assert list(r) == [2] and v[0] == np.inf
    r, v = K.canonicalize(np.array([1, 1]), np.array([np.inf, -np.inf]))
    assert len(r) == 2


def test_div_ieee_special_cases():
    # x/0 -> ±inf, 0/0 -> NaN (ref pyrle/src/rle.pyx:220-287)
    r, v = K.rle_div(
        np.array([1, 1, 1]), np.array([1.0, -2.0, 0.0]),
        np.array([3]), np.array([0.0]))
    dense = np.repeat(v, r)
    assert dense[0] == np.inf and dense[1] == -np.inf and np.isnan(dense[2])


def test_align_pad_nan_for_eq():
    # ==/!= pad with NaN; trailing region compares as not-equal
    a = Rle(np.array([2]), np.array([1.0]))
    b = Rle(np.array([4]), np.array([1.0]))
    eq = a == b
    assert eq.length == 4
    assert list(K.rle_decode(eq.runs, eq.values)) == [1.0, 1.0, 0.0, 0.0]


@given(rle_pair(), st.integers(0, 60), st.integers(0, 60))
def test_slice_vs_dense(a, start, end):
    r, v = a
    dense = np.repeat(v, r)
    sr, sv = K.rle_slice(r, v, start, end)
    assert np.array_equal(np.repeat(sv, sr), dense[start:end])


@given(rle_pair(), st.lists(st.integers(0, 80), min_size=1, max_size=5))
def test_getlocs_vs_dense(a, locs):
    r, v = a
    dense = np.repeat(v, r)
    got = K.rle_getlocs(r, v, np.array(locs))
    expected = [dense[loc] if loc < len(dense) else 0.0 for loc in locs]
    assert np.allclose(got, expected)


@given(rle_pair(), st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                            min_size=1, max_size=5))
def test_getitems_vs_dense(a, queries):
    r, v = a
    dense = np.repeat(v, r)
    starts = np.array([min(s, e) for s, e in queries], dtype=np.int64)
    ends = np.array([max(s, e) for s, e in queries], dtype=np.int64)
    ids, qs, qe, out_r, out_v = K.rle_getitems(r, v, starts, ends)
    for q in range(len(queries)):
        mask = ids == q
        got = np.repeat(out_v[mask], out_r[mask])
        s = min(starts[q], len(dense))
        e = min(ends[q], len(dense))
        assert np.array_equal(got, dense[s:e])


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 20),
                          st.integers(-5, 5)), min_size=1, max_size=12))
def test_coverage_vs_dense(intervals):
    starts = np.array([s for s, _, _ in intervals], dtype=np.int64)
    ends = starts + np.array([l for _, l, _ in intervals], dtype=np.int64)
    weights = np.array([w for _, _, w in intervals], dtype=np.float64)
    r, v = K.coverage(starts, ends, weights)
    hi = int(ends.max())
    dense = np.zeros(hi)
    for s, e, w in zip(starts, ends, weights):
        dense[s:e] += w
    got = np.repeat(v, r)
    assert len(got) == hi
    assert np.allclose(got, dense)


@given(rle_pair(), st.integers(-30, 30), st.booleans())
def test_shift_vs_dense(a, dist, preserve):
    """Reference convention (pyrle/rle.py:1000-1095): positive dist = right
    shift (prepend fill), negative = left shift (drop front)."""
    r, v = a
    dense = np.repeat(v, r)
    n = len(dense)
    sr, sv = K.rle_shift(r, v, dist, preserve_length=preserve, fill=0.0)
    got = np.repeat(sv, sr)
    if dist >= 0:
        expected = np.concatenate([np.zeros(dist), dense])
        if preserve:
            expected = expected[:n]
    else:
        d = min(-dist, n)
        expected = dense[d:]
        if preserve:
            expected = np.pad(expected, (0, d))
    assert np.allclose(got, expected)


def test_shift_matches_reference_doctests():
    """The reference's own shift doctests (pyrle/rle.py:1028-1058)."""
    from tokrle.rle import Rle

    r = Rle(np.array([3, 2, 1]), np.array([1.0, -1.0, 2.0]))
    out = r.shift(2, preserve_length=False, fill=np.nan)
    assert np.array_equal(out.runs, [2, 3, 2, 1])
    assert np.allclose(out.values, [np.nan, 1, -1, 2], equal_nan=True)
    out = r.shift(2)
    assert np.array_equal(out.runs, [2, 3, 1])
    assert np.allclose(out.values, [0, 1, -1])
    out = r.shift(-2, fill=np.nan)
    assert np.array_equal(out.runs, [1, 2, 1, 2])
    assert np.allclose(out.values, [1, -1, 2, np.nan], equal_nan=True)
    out = r.shift(-4, preserve_length=False)
    assert np.array_equal(out.runs, [1, 1])
    assert np.allclose(out.values, [-1, 2])


def test_mean_std_reference_formulas():
    # mean == sum(values)/sum(runs), NOT length-weighted (ref pyrle/rle.py:952-959)
    r = Rle(np.array([1, 2, 1]), np.array([1.0, 2.0, 3.0]))
    assert r.mean() == 6 / 4
    # std: square outside the sum (ref pyrle/rle.py:1111)
    m = r.mean()
    expected = np.sqrt(np.sum(r.values - m) ** 2 / (r.length - 1))
    assert r.std() == expected


def test_scalar_ops_touch_only_values():
    r = Rle(np.array([2, 3]), np.array([1.0, 4.0]))
    out = r + 10
    assert np.array_equal(out.runs, r.runs)
    assert np.array_equal(out.values, np.array([11.0, 14.0]))
    out = 2 * r
    assert np.array_equal(out.values, np.array([2.0, 8.0]))
    out = r / 2
    assert np.array_equal(out.values, np.array([0.5, 2.0]))


def test_binop_large_runs_no_dense_materialization():
    """Runs up to 1e7 (the reference hypothesis domain,
    tests/hypothesis_helper.py:12,28): the boundary-union kernel stays
    O(#runs); verify via point lookups instead of dense vectors."""
    rng = np.random.default_rng(99)
    r1 = rng.integers(1, 10_000_000, size=200).astype(np.int64)
    v1 = rng.integers(-1_000_000, 1_000_000, size=200).astype(np.float64)
    r2 = rng.integers(1, 10_000_000, size=300).astype(np.int64)
    v2 = rng.integers(-1_000_000, 1_000_000, size=300).astype(np.float64)
    rr, vv = K.rle_add(r1, v1, r2, v2)
    n1, n2 = int(r1.sum()), int(r2.sum())
    assert int(rr.sum()) == max(n1, n2)
    locs = rng.integers(0, max(n1, n2), size=1000)
    got = K.rle_getlocs(rr, vv, locs)
    a = K.rle_getlocs(r1, v1, locs)
    b = K.rle_getlocs(r2, v2, locs)
    # getlocs returns 0 past the end — exactly the zero-pad semantics
    assert np.allclose(got, a + b)

    # division with the same magnitudes: IEEE special cases only where the
    # divisor is zero (none here since values exclude 0 -> add 0 run check)
    rr, vv = K.rle_mul(r1, v1, r2, v2)
    got = K.rle_getlocs(rr, vv, locs)
    mask = (locs < n1) & (locs < n2)
    assert np.allclose(got[mask], (a * b)[mask])
    assert np.allclose(got[~mask], 0.0)


def test_leader_coalesce_segmented_matches_sequential_reference():
    """The segmented _leader_coalesce (hard-boundary confinement +
    whole-segment fast path) must equal the plain sequential leader walk
    on adversarial value patterns: tol-jitter chains, soft-but-not-
    candidate spacings (~1.5 tol), exact 2-tol boundaries, NaN/inf
    stretches (r4 verdict 'what's wrong' item 4)."""
    import numpy as np

    from tokrle.kernels.rle import COALESCE_ABS_TOL as TOL
    from tokrle.kernels.rle import _leader_coalesce

    def reference(runs, values):
        # the pre-r5 sequential walk (after the same exact fold the
        # kernel applies first)
        from tokrle.kernels.rle import _exact_fold

        runs, values = _exact_fold(np.asarray(runs, np.int64),
                                   np.asarray(values, np.float64))
        if len(values) <= 1:
            return runs, values
        out_r, out_v = [], []
        lead_v, lead_r = values[0], int(runs[0])
        for i in range(1, len(values)):
            vi = values[i]
            if (np.isnan(vi) and np.isnan(lead_v)) or \
               (vi == lead_v and np.isinf(vi)) or \
               (abs(vi - lead_v) < TOL):
                lead_r += int(runs[i])
            else:
                out_r.append(lead_r)
                out_v.append(lead_v)
                lead_r, lead_v = int(runs[i]), vi
        out_r.append(lead_r)
        out_v.append(lead_v)
        return (np.asarray(out_r, np.int64), np.asarray(out_v, np.float64))

    rng = np.random.default_rng(17)
    specials = np.array([np.nan, np.inf, -np.inf, 0.0])
    for trial in range(300):
        n = int(rng.integers(1, 40))
        kind = rng.integers(0, 4)
        if kind == 0:      # jitter chain around a few levels
            base = rng.choice([0.0, 1.0, 2.0], n)
            vals = base + rng.uniform(-1.5, 1.5, n) * TOL
        elif kind == 1:    # steps near the 1x / 2x tol knees
            steps = rng.choice([0.4, 0.9, 1.1, 1.5, 1.9, 2.0, 2.1], n) \
                * TOL * rng.choice([-1, 1], n)
            vals = np.cumsum(steps)
        elif kind == 2:    # NaN / inf stretches mixed with finites
            vals = rng.choice(specials, n) + 0.0
            fin = rng.random(n) < 0.5
            vals[fin] = rng.choice([0.0, 0.5, 1.0], fin.sum())
        else:              # fully random
            vals = rng.normal(0, 1, n)
        runs = rng.integers(1, 5, n).astype(np.int64)
        got_r, got_v = _leader_coalesce(runs.copy(), vals.copy())
        want_r, want_v = reference(runs, vals)
        assert np.array_equal(got_r, want_r), (trial, vals)
        assert np.allclose(got_v, want_v, equal_nan=True, atol=0), \
            (trial, vals)
        assert got_r.sum() == runs.sum()
