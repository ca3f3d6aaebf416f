"""HyperLogLog sketch operator: estimation accuracy vs exact distinct
counts, merge associativity, and the distributed per-key pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tokrle.functions.sketch import hll_estimate, hll_partial


@pytest.mark.parametrize("n", [10, 1000, 50_000])
def test_hll_accuracy(n):
    rng = np.random.default_rng(5)
    values = rng.integers(0, 1 << 40, size=3 * n, dtype=np.int64)
    values = np.unique(values)[:n]          # exactly n distinct
    data = np.repeat(values, 3)             # duplicates must not matter
    est = hll_estimate(hll_partial(data, p=12))
    # standard error for p=12 is ~1.04/sqrt(4096) = 1.6%; allow 5%
    assert abs(est - n) / n < 0.05


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 1 << 50, size=20_000, dtype=np.int64)
    b = rng.integers(0, 1 << 50, size=20_000, dtype=np.int64)
    merged = np.maximum(hll_partial(a), hll_partial(b))
    single = hll_partial(np.concatenate([a, b]))
    assert np.array_equal(merged, single)


def test_hll_empty():
    regs = hll_partial(np.empty(0, dtype=np.int64))
    assert hll_estimate(regs) == 0.0


def test_hll_distinct_by_key_pipeline(ray_session):
    import ray.data

    from tokrle.functions.sketch import hll_distinct_by_key

    rng = np.random.default_rng(7)
    rows = []
    truth = {}
    for key, n_distinct in [("a", 500), ("b", 3000)]:
        vals = np.unique(rng.integers(0, (1 << 31) - 1, size=4 * n_distinct,
                                      dtype=np.int64))[:n_distinct]
        truth[key] = n_distinct
        toks = np.repeat(vals, 2)
        rng.shuffle(toks)
        for chunk in np.array_split(toks, 20):
            rows.append({"doc_id": f"{key}{len(rows)}",
                         "tokens": chunk.astype(np.int32).tolist(),
                         "n_tok": len(chunk), "source": key})
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = hll_distinct_by_key(ds, "source")
    for _, r in out.iterrows():
        exact = truth[r["source"]]
        assert abs(r["approx_unique"] - exact) / exact < 0.06


def test_histogram_quantiles_match_numpy(ray_session):
    import ray.data

    from tokrle.functions.quantiles import histogram_quantiles_by_key

    rng = np.random.default_rng(9)
    rows = []
    for key in ("x", "y"):
        for v in rng.integers(1, 400, size=5000):
            rows.append({"k": key, "v": int(v)})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    out = histogram_quantiles_by_key(ds, "k", "v", qs=(0.5, 0.9))
    for _, r in out.iterrows():
        vals = np.sort(df.loc[df["k"] == r["k"], "v"].to_numpy())
        n = len(vals)
        assert r["q50"] == vals[int(np.ceil(0.5 * n)) - 1]
        assert r["q90"] == vals[int(np.ceil(0.9 * n)) - 1]


def test_count_min_bounds_and_distributed_fold(ray_session):
    """One-sided guarantee (never under-counts) on every item; estimates
    for genuinely heavy items are tight; distributed fold == local
    partial sum."""
    import ray

    from tokrle.functions.sketch import cm_partial, cm_query, cm_sketch_tokens

    rng = np.random.default_rng(17)
    values = np.concatenate([
        rng.zipf(1.5, 50000).astype(np.int64) % 10000,
        np.repeat(np.array([42, 7, 900], dtype=np.int64), 5000),
    ])
    true = {int(v): int(c) for v, c in
            zip(*np.unique(values, return_counts=True))}
    mat = cm_partial(values)
    items = np.array(list(true), dtype=np.int64)
    est = cm_query(mat, items)
    assert (est >= np.array([true[int(i)] for i in items])).all()
    # heavy items stay tight: overcount bounded well below epsilon*N
    for hot in (42, 7, 900):
        e = int(cm_query(mat, np.array([hot]))[0])
        assert true[hot] <= e <= true[hot] + len(values) // 1000
    # distributed: same multiset through Ray partials must give the SAME
    # matrix (sums are associative)
    docs = pa.table({
        "doc_id": pa.array([str(i) for i in range(65)]),
        "tokens": pa.array([values[i::65].tolist() for i in range(65)],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(values[i::65]) for i in range(65)],
                          type=pa.int32()),
        "source": pa.array(["s"] * 65),
    })
    ds = ray.data.from_arrow(docs).repartition(7)
    mat2 = cm_sketch_tokens(ds)
    assert np.array_equal(mat, mat2)


def test_tdigest_rank_error_bound_and_merge():
    """Rank error of the vectorized scale-function t-digest stays under
    0.5% across distributions, and chunk-merged digests keep the bound."""
    from tokrle.functions.tdigest import tdigest_compress, tdigest_quantiles

    rng = np.random.default_rng(1)
    for data in (rng.uniform(0, 1, 100_000),
                 rng.standard_normal(100_000),
                 rng.lognormal(0, 2, 100_000)):
        s = np.sort(data)
        for q in (0.01, 0.5, 0.99):
            est = tdigest_quantiles(data, np.ones(len(data)), (q,))[0]
            assert abs(np.searchsorted(s, est) / len(s) - q) < 0.005
        # merged chunks obey the same bound
        vs, ws = [], []
        for c in np.array_split(data, 23):
            v, w = tdigest_compress(c, np.ones(len(c)))
            assert len(v) <= 220          # bounded sketch size
            vs.append(v)
            ws.append(w)
        for q in (0.01, 0.5, 0.99):
            est = tdigest_quantiles(np.concatenate(vs), np.concatenate(ws),
                                    (q,))[0]
            assert abs(np.searchsorted(s, est) / len(s) - q) < 0.005


def test_tdigest_by_key_distributed(ray_session):
    """Per-key distributed t-digest: every key's p50/p99 is rank-accurate
    vs the exact per-key sort, under two different partitionings."""
    import ray

    from tokrle.functions.tdigest import tdigest_quantiles_by_key

    rng = np.random.default_rng(5)
    n = 60_000
    key = rng.choice(["a", "b", "c"], n)
    val = np.where(key == "a", rng.lognormal(0, 1, n),
                   np.where(key == "b", rng.standard_normal(n),
                            rng.uniform(-5, 5, n)))
    df = pd.DataFrame({"k": key, "x": val})
    for parts in (2, 11):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = tdigest_quantiles_by_key(ds, "k", "x", qs=(0.5, 0.99))
        assert list(got["k"]) == ["a", "b", "c"]
        for _, row in got.iterrows():
            s = np.sort(val[key == row["k"]])
            for q, col in ((0.5, "q50"), (0.99, "q99")):
                rank = np.searchsorted(s, row[col]) / len(s)
                assert abs(rank - q) < 0.005, (parts, row["k"], q, rank)


def test_tdigest_compress_invariants_hypothesis():
    """Structural invariants under arbitrary inputs: total weight exactly
    preserved, centroid means inside [min, max], centroids sorted, count
    bounded, and empty input round-trips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tokrle.functions.tdigest import tdigest_compress

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=32), min_size=0, max_size=2000))
    def run(xs):
        x = np.asarray(xs, dtype=np.float64)
        v, w = tdigest_compress(x, np.ones(len(x)), delta=100)
        assert w.sum() == len(x)
        assert len(v) <= 120
        if len(x):
            assert v.min() >= x.min() - 1e-9
            assert v.max() <= x.max() + 1e-9
            assert (np.diff(v) >= -1e-9).all()   # sorted by value
        else:
            assert len(v) == 0

    run()
