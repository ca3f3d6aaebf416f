"""Vectorized run-length-encoding kernels (pure NumPy, no Ray).

These re-express the reference's Cython inner loops as vectorized NumPy
kernels over flat buffers, per the north star:

- RLE encode (boundary detection)      — ref pyrle/rle.py:34-64 (find_runs)
- canonicalize / run coalescing        — ref pyrle/rle.py:139-159 +
                                         pyrle/src/coverage.pyx:87-183 (_remove_dupes)
- binary run-merge arithmetic          — ref pyrle/src/rle.pyx:20-349
                                         (add/sub/mul/div two-pointer loops),
                                         re-expressed as boundary-union +
                                         searchsorted (O(#runs), never O(length))
- length alignment (zero/NaN pad)      — ref pyrle/rle.py:17-31 (_make_rles_equal_length)
- slicing / point / batched range gets — ref pyrle/src/getitem.pyx
- coverage (interval deltas → runs)    — ref pyrle/src/coverage.pyx:28-81 (_coverage)
- shift                                — ref pyrle/rle.py:1000-1095

Semantics intentionally reproduced from the reference:

- canonical form drops zero-length runs and coalesces adjacent runs whose
  values differ by < 1e-5 in absolute terms (plus NaN-NaN and matching-inf
  merging), but the coalesce pass only triggers when some *adjacent pair* is
  np.isclose (rtol=1e-5, atol=1e-8, equal_nan=True) — exactly the reference
  constructor's trigger (pyrle/rle.py:154-156).
- coalescing compares each run against the *leader* (first value) of the
  current merged group, not a rolling value (pyrle/src/coverage.pyx:115-137).
- documented divergence: the reference's Cython loop downcasts the candidate
  value to float32 before comparing (``cdef float value``); we keep float64.
  For the reference's own test domain (integers < 2^24) the results agree.

All run arrays are int64, value arrays float64 in this (pyrle-semantics)
layer.  The token-codec layer (tokrle.codecs) uses integer-native dtypes
with exact equality instead.
"""

from __future__ import annotations

import numpy as np

COALESCE_ABS_TOL = 1e-5  # ref pyrle/src/coverage.pyx:127


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def rle_encode(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dense vector -> (runs:int64, values:same-dtype) via boundary detection.

    Vectorized equivalent of the reference's find_runs (pyrle/rle.py:34-64)
    but dtype-preserving (the reference always casts values to float64; the
    pyrle-parity layer does that cast in its constructor instead so the token
    codecs can stay integer-native).
    """
    x = np.asarray(x)
    n = x.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), x[:0]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    if np.issubdtype(x.dtype, np.floating):
        # NaN != NaN would split NaN stretches into unit runs; treat
        # consecutive NaNs as one run (matches repeat/decode round-trip).
        a, b = x[:-1], x[1:]
        np.not_equal(a, b, out=boundary[1:])
        both_nan = np.isnan(a) & np.isnan(b)
        boundary[1:] &= ~both_nan
    else:
        np.not_equal(x[:-1], x[1:], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    runs = np.diff(starts, append=n).astype(np.int64)
    return runs, x[starts]


def rle_decode(runs: np.ndarray, values: np.ndarray) -> np.ndarray:
    """(runs, values) -> dense vector (``repeat(values, runs)``)."""
    return np.repeat(values, runs)


# ---------------------------------------------------------------------------
# canonicalization (constructor semantics)
# ---------------------------------------------------------------------------

def _leader_coalesce(runs: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-leader coalesce, semantics of _remove_dupes (coverage.pyx:87-183).

    Merges run i into the current group when its value is NaN and the leader
    is NaN, both are the same infinity, or |v - leader| < 1e-5.  The merged
    group keeps the leader's value.  Only called on the (rare) arrays where
    the constructor trigger fired; the common exact-duplicate case is folded
    vectorized first, which cannot change leader assignment (merging
    exactly-equal neighbours never moves a leader).
    """
    # vectorized exact fold first (handles the overwhelmingly common case)
    runs, values = _exact_fold(runs, values)
    n = len(values)
    if n <= 1:
        return runs, values
    v, pv = values[1:], values[:-1]
    both_nan = np.isnan(v) & np.isnan(pv)
    same_inf = (v == pv) & np.isinf(v)
    dv = np.abs(v - pv)
    cand = (dv < COALESCE_ABS_TOL) | both_nan | same_inf
    if not cand.any():
        return runs, values
    # SOFT boundaries are the only places a merge can happen or a group
    # can continue; a HARD boundary (|dv| >= 2*tol, or a NaN/inf
    # mismatch) provably ends every group: a finite leader L has every
    # member within tol, so |v_i - L| >= |v_i - v_{i-1}| - tol >= tol;
    # NaN groups only extend over NaNs, inf groups only over the same
    # inf.  Segments between hard boundaries are therefore independent,
    # and the sequential leader walk runs only inside segments that
    # contain a candidate — plus a reduceat fast path when a whole
    # segment provably collapses into its first value.
    soft = (dv < 2.0 * COALESCE_ABS_TOL) | both_nan | same_inf
    hard_idx = np.flatnonzero(~soft) + 1         # segment starts (> 0)
    seg_starts = np.concatenate(([0], hard_idx))
    seg_ends = np.concatenate((hard_idx, [n]))   # exclusive
    out_r: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    for s, e in zip(seg_starts, seg_ends):
        if e - s == 1 or not cand[s:e - 1].any():
            # no merge inside this segment: pass through wholesale
            out_r.append(runs[s:e])
            out_v.append(values[s:e])
            continue
        seg_v = values[s:e]
        lead = seg_v[0]
        if (np.isnan(lead) and np.isnan(seg_v).all()) or \
            (np.isinf(lead) and (seg_v == lead).all()) or \
            (np.isfinite(lead)
             and bool((np.abs(seg_v - lead) < COALESCE_ABS_TOL).all())):
            # whole segment within tol of its leader: one group
            out_r.append(np.array([runs[s:e].sum()], dtype=np.int64))
            out_v.append(seg_v[:1])
            continue
        # residual leader walk, confined to this segment
        rr: list[int] = []
        vv: list[float] = []
        lead_r = int(runs[s])
        for i in range(s + 1, e):
            vi = values[i]
            if (np.isnan(vi) and np.isnan(lead)) or \
               (vi == lead and np.isinf(vi)) or \
               (abs(vi - lead) < COALESCE_ABS_TOL):
                lead_r += int(runs[i])
            else:
                rr.append(lead_r)
                vv.append(lead)
                lead_r = int(runs[i])
                lead = vi
        rr.append(lead_r)
        vv.append(lead)
        out_r.append(np.asarray(rr, dtype=np.int64))
        out_v.append(np.asarray(vv, dtype=np.float64))
    return (np.concatenate(out_r).astype(np.int64),
            np.concatenate(out_v).astype(np.float64))


def _exact_fold(runs: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge adjacent exactly-equal (or both-NaN) values, vectorized."""
    if len(values) <= 1:
        return runs, values
    a, b = values[:-1], values[1:]
    same = (a == b) | (np.isnan(a) & np.isnan(b))
    if not same.any():
        return runs, values
    starts = np.concatenate(([0], np.flatnonzero(~same) + 1))
    new_runs = np.add.reduceat(runs, starts)
    return new_runs.astype(np.int64), values[starts]


def canonicalize(runs: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference Rle-constructor canonical form (pyrle/rle.py:139-159).

    1. drop zero-length runs;
    2. if any adjacent pair is np.isclose (rtol=1e-5, atol=1e-8,
       equal_nan=True) — the exact constructor trigger — run the
       leader-coalesce pass.
    """
    runs = np.asarray(runs, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    nz = runs != 0
    if not nz.all():
        runs = runs[nz]
        values = values[nz]
    if len(values) > 1:
        trigger = np.isclose(values[:-1], values[1:], equal_nan=True)
        if trigger.any():
            runs, values = _leader_coalesce(runs, values)
    return runs, values


def defragment(runs: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """canonicalize + normalize -0.0 -> 0.0 (ref pyrle/rle.py:879-915)."""
    runs, values = canonicalize(runs, values)
    values = values + 0.0  # -0.0 + 0.0 == +0.0
    return runs, values


# ---------------------------------------------------------------------------
# alignment + binary run-merge arithmetic
# ---------------------------------------------------------------------------

def align_pad(r1, v1, r2, v2, fill: float = 0.0):
    """Extend the shorter logical vector with one fill run so both operands
    have equal logical length (ref pyrle/rle.py:17-31).  fill=0 for
    arithmetic, NaN for ==/!= (ref pyrle/rle.py:272,518)."""
    l1 = int(r1.sum())
    l2 = int(r2.sum())
    if l1 > l2:
        r2 = np.append(r2, l1 - l2)
        v2 = np.append(v2, fill)
    elif l2 > l1:
        r1 = np.append(r1, l2 - l1)
        v1 = np.append(v1, fill)
    return r1, v1, r2, v2


def rle_binop(r1, v1, r2, v2, op) -> tuple[np.ndarray, np.ndarray]:
    """Binary op on two equal-length RLE vectors via boundary union.

    Re-expresses the reference's two-pointer Cython merge loops
    (pyrle/src/rle.pyx:20-349) as: union of cumulative-run boundaries ->
    per-segment source-run lookup via searchsorted -> elementwise combine.
    O(#runs log #runs), never O(logical length).  Output is NOT canonicalized
    — callers pass it through :func:`canonicalize`, exactly as the
    reference's kernels return un-canonicalized arrays to the Rle
    constructor (pyrle/rle.py:200).
    """
    if len(r1) == 0 and len(r2) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    c1 = np.cumsum(r1)
    c2 = np.cumsum(r2)
    bounds = np.union1d(c1, c2)
    out_runs = np.diff(bounds, prepend=0)
    i1 = np.searchsorted(c1, bounds, side="left")
    i2 = np.searchsorted(c2, bounds, side="left")
    with np.errstate(divide="ignore", invalid="ignore"):
        out_vals = op(v1[i1], v2[i2])
    return out_runs.astype(np.int64), np.asarray(out_vals, dtype=np.float64)


def rle_add(r1, v1, r2, v2):
    r1, v1, r2, v2 = align_pad(r1, v1, r2, v2, 0.0)
    return canonicalize(*rle_binop(r1, v1, r2, v2, np.add))


def rle_sub(r1, v1, r2, v2):
    r1, v1, r2, v2 = align_pad(r1, v1, r2, v2, 0.0)
    return canonicalize(*rle_binop(r1, v1, r2, v2, np.subtract))


def rle_mul(r1, v1, r2, v2):
    r1, v1, r2, v2 = align_pad(r1, v1, r2, v2, 0.0)
    return canonicalize(*rle_binop(r1, v1, r2, v2, np.multiply))


def rle_div(r1, v1, r2, v2):
    """Elementwise division with IEEE special cases: x/0 -> ±inf (sign from
    numerator), 0/0 -> NaN — matching div_rles_zeroes
    (pyrle/src/rle.pyx:220-287).  NumPy float64 division under errstate has
    identical semantics; the reference's nonzeroes fast path
    (pyrle/rle.py:740-743) is a performance dispatch only, with equal
    results, so a single kernel suffices."""
    r1, v1, r2, v2 = align_pad(r1, v1, r2, v2, 0.0)
    return canonicalize(*rle_binop(r1, v1, r2, v2, np.true_divide))


def rle_compare(r1, v1, r2, v2, comparison: str):
    """Comparisons implemented as the reference does (pyrle/rle.py:248-276,
    342-466, 502-522): subtract, then threshold the difference's values to
    1.0/0.0, then defragment.  ``==``/``!=`` pad the shorter side with NaN;
    the ordering comparisons pad with 0."""
    fill = np.nan if comparison in ("eq", "ne") else 0.0
    r1, v1, r2, v2 = align_pad(r1, v1, r2, v2, fill)
    dr, dv = canonicalize(*rle_binop(r1, v1, r2, v2, np.subtract))
    with np.errstate(invalid="ignore"):
        if comparison == "eq":
            out = np.where(dv == 0, 1.0, 0.0)
        elif comparison == "ne":
            out = np.where(dv != 0, 1.0, 0.0)
        elif comparison == "ge":
            out = np.where(dv >= 0, 1.0, 0.0)
        elif comparison == "gt":
            out = np.where(dv > 0, 1.0, 0.0)
        elif comparison == "le":
            out = np.where(dv <= 0, 1.0, 0.0)
        elif comparison == "lt":
            out = np.where(dv < 0, 1.0, 0.0)
        else:
            raise ValueError(comparison)
    return defragment(dr, out)


# ---------------------------------------------------------------------------
# random access / slicing (decode-domain range lookups)
# ---------------------------------------------------------------------------

def rle_getlocs(runs, values, locs) -> np.ndarray:
    """Point lookup: positions -> values (ref pyrle/src/getitem.pyx:89-109).
    Positions beyond the logical length return 0.0 like the reference's
    linear walk leaves the default."""
    c = np.cumsum(runs)
    locs = np.asarray(locs)
    idx = np.searchsorted(c, locs, side="right")
    out = np.zeros(len(locs), dtype=np.float64)
    ok = idx < len(values)
    out[ok] = values[idx[ok]]
    return out


def rle_slice(runs, values, start: int, end: int) -> tuple[np.ndarray, np.ndarray]:
    """Slice [start:end) of the logical vector -> sub-(runs, values), with
    first/last run clipping (ref pyrle/src/getitem.pyx:11-83)."""
    length = int(np.sum(runs))
    start = max(0, start)
    end = min(end, length)
    if start >= end:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    c = np.cumsum(runs)
    i0 = np.searchsorted(c, start, side="right")
    i1 = np.searchsorted(c, end, side="left")
    sub_r = runs[i0:i1 + 1].astype(np.int64, copy=True)
    sub_v = values[i0:i1 + 1].copy()
    prev_end = c[i0 - 1] if i0 > 0 else 0
    sub_r[0] -= start - prev_end
    sub_r[-1] -= c[i1] - end
    return sub_r, sub_v


def rle_getitems(runs, values, starts, ends):
    """Batched range lookup (the engine's "range join"): N query intervals ->
    concatenated clipped sub-runs, each row tagged with its query index
    (ref pyrle/src/getitem.pyx:201-325).

    Returns (ids, q_starts, q_ends, out_runs, out_values) parallel arrays.
    Vectorized: searchsorted for both endpoints, ragged gather via offsets.
    """
    runs = np.asarray(runs)
    values = np.asarray(values)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    length = int(runs.sum())
    c = np.cumsum(runs)
    s = np.clip(starts, 0, length)
    e = np.clip(ends, 0, length)
    i0 = np.searchsorted(c, s, side="right")
    i1 = np.searchsorted(c, e, side="left")
    counts = np.where(e > s, i1 - i0 + 1, 0)
    total = int(counts.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy(), z.copy(), np.empty(0, np.float64)
    # ragged gather: for query q, source run indices i0[q] .. i0[q]+counts[q)-1
    offsets = np.concatenate(([0], np.cumsum(counts)))
    pos = np.arange(total, dtype=np.int64)
    qid = np.searchsorted(offsets, pos, side="right") - 1
    src = pos - offsets[qid] + i0[qid]
    out_runs = runs[src].astype(np.int64, copy=True)
    out_vals = values[src].astype(np.float64, copy=False).copy()
    # clip first run of each query
    first = offsets[:-1][counts > 0]
    fq = np.flatnonzero(counts > 0)
    prev_end = np.where(i0[fq] > 0, c[i0[fq] - 1], 0)
    out_runs[first] -= s[fq] - prev_end
    # clip last run of each query
    last = (offsets[1:] - 1)[counts > 0]
    out_runs[last] -= c[i1[fq]] - e[fq]
    return qid, s[qid], e[qid], out_runs, out_vals


# ---------------------------------------------------------------------------
# coverage (intervals -> step function) and shift
# ---------------------------------------------------------------------------

def coverage(starts, ends, weights=None):
    """Intervals -> (runs, values) step function: prefix sum of ±weight
    deltas at interval boundaries (ref pyrle/methods.py:139-156 +
    pyrle/src/coverage.pyx:28-81), fully vectorized.

    Matches the reference: positions before the first event get a leading
    0-valued run (merged away if the first value is also 0); the step
    function ends at the last event position.
    """
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n = len(starts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if weights is None:
        weights = np.ones(n, dtype=np.float64)
    else:
        weights = np.asarray(weights, dtype=np.float64)
    positions = np.concatenate([starts, ends])
    deltas = np.concatenate([weights, -weights])
    uniq, inv = np.unique(positions, return_inverse=True)
    sums = np.bincount(inv, weights=deltas, minlength=len(uniq))
    cum = np.cumsum(sums)
    # runs: [uniq[0]] leading zero run (if uniq[0] > 0), then diffs
    if uniq[0] > 0:
        runs = np.concatenate(([uniq[0]], np.diff(uniq)))
        values = np.concatenate(([0.0], cum[:-1]))
    else:
        runs = np.diff(uniq)
        values = cum[:-1]
    return canonicalize(runs, values)


def rle_shift(runs, values, dist: int, preserve_length: bool = True,
              fill: float = 0.0):
    """Shift the logical vector by ``dist`` (ref pyrle/rle.py:1000-1095).

    Reference convention: positive ``dist`` shifts RIGHT (prepends a fill
    run, truncating the tail to the original length when preserving);
    negative shifts LEFT (drops the first ``-dist`` positions, appending a
    fill run when preserving).  Documented divergence: the reference raises
    on left-shifts past the end with preserve_length (pyrle/rle.py:1089
    indexes an empty array); here the result is a pure fill vector.
    """
    runs = np.asarray(runs, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    length = int(runs.sum())
    if dist == 0 or length == 0:
        return runs.copy(), values.copy()
    if dist > 0:  # right shift: prepend fill run
        r = np.concatenate(([dist], runs))
        v = np.concatenate(([fill], values))
        if preserve_length:
            r, v = rle_slice(r, v, 0, length)
        return canonicalize(r, v)
    d = -dist  # left shift: consume the front
    r, v = rle_slice(runs, values, d, length)
    if preserve_length:
        pad = min(d, length)
        r = np.append(r, pad)
        v = np.append(v, fill)
    return canonicalize(r, v)
