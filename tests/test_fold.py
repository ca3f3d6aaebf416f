"""Property tests for tokrle.functions.fold: the driver-side
tiny-cardinality fold must equal a plain pandas groupby on the same
rows, for any partitioning and any fold-buffer boundary."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_ds(df: pd.DataFrame, blocks: int):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pandas(df)) \
        .repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_source_sums_matches_pandas(ray_session, blocks):
    from tokrle.functions.fold import source_sums

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame({
        "source": rng.choice([f"s{i}" for i in range(6)], n),
        "a": rng.integers(-100, 100, n),
        "b": rng.integers(0, 10, n),
    })
    got = source_sums(_make_ds(df, blocks), "source", ["a", "b"],
                      count_alias="n",
                      min_cols=(), max_cols=())
    want = df.groupby("source").agg(a=("a", "sum"), b=("b", "sum"),
                                    n=("a", "size")).reset_index() \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["source", "a", "b", "n"]].astype({"a": "int64", "b": "int64",
                                               "n": "int64"}),
        want.astype({"a": "int64", "b": "int64", "n": "int64"}))


def test_source_sums_extrema(ray_session):
    from tokrle.functions.fold import source_sums

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "s": rng.integers(0, 50, n),
        "lo": rng.integers(-1000, 1000, n),
        "hi": rng.integers(-1000, 1000, n),
    })
    got = source_sums(_make_ds(df, 4), "k", ["s"], count_alias="c",
                      min_cols=("lo",), max_cols=("hi",))
    want = df.groupby("k").agg(s=("s", "sum"), c=("s", "size"),
                               lo=("lo", "min"), hi=("hi", "max")) \
        .reset_index().sort_values("k").reset_index(drop=True)
    for col in ("s", "c", "lo", "hi"):
        assert got[col].astype("int64").tolist() == \
            want[col].astype("int64").tolist(), col


def test_fold_refold_boundary(ray_session, monkeypatch):
    """Force the incremental re-fold to trigger mid-stream and check the
    result is unchanged."""
    import tokrle.functions.fold as F

    monkeypatch.setattr(F, "_FOLD_EVERY", 8)
    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame({"g": rng.choice(["a", "b"], n),
                       "v": rng.integers(0, 9, n)})
    got = F.source_sums(_make_ds(df, 5), "g", ["v"], count_alias="n")
    want = df.groupby("g").agg(v=("v", "sum"), n=("v", "size")) \
        .reset_index().sort_values("g").reset_index(drop=True)
    assert got["v"].astype("int64").tolist() == want["v"].tolist()
    assert got["n"].astype("int64").tolist() == want["n"].tolist()


def test_fold_empty_dataset(ray_session):
    from tokrle.functions.fold import fold_sum_partials, source_sums

    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64())}))
    out = fold_sum_partials(empty, ["k"], ["v"])
    assert len(out) == 0 and list(out.columns) == ["k", "v"]
    out2 = source_sums(empty, "k", ["v"], count_alias="n")
    assert len(out2) == 0


def test_source_sums_int64_exact_past_2pow53(ray_session):
    """Integer partials must be exact where float64 rounds: per-key sums
    mixing 2^60-scale values with small ones (VERDICT r4 #4)."""
    from tokrle.functions.fold import source_sums

    big = 1 << 60
    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b"],
        "v": [big, 3, -big, 5, big, 7],
    })
    got = source_sums(_make_ds(df, 2), "k", ["v"])
    want = df.groupby("k")["v"].sum()
    assert got.set_index("k")["v"].astype("int64").to_dict() == \
        want.to_dict()
    assert got.set_index("k")["v"]["a"] == 8  # float64 would read 0


def test_source_sums_null_keys(ray_session):
    """Null keys form a group (parity with the Ray groupby exchange the
    fold replaced); previously factorize's -1 sentinel made bincount
    raise and corrupted the extremum scatter (ADVICE r4)."""
    from tokrle.functions.fold import source_sums

    df = pd.DataFrame({
        "k": ["x", None, "y", None, "x"],
        "v": [1, 10, 100, 1000, 10000],
        "m": [5, -7, 2, -9, 3],
    })
    got = source_sums(_make_ds(df, 2), "k", ["v"], count_alias="n",
                      min_cols=("m",))
    want = df.groupby("k", dropna=False).agg(
        v=("v", "sum"), n=("v", "size"), m=("m", "min")).reset_index()
    gm = {(None if pd.isna(k) else k): (v, n, m) for k, v, n, m in
          got[["k", "v", "n", "m"]].itertuples(index=False)}
    wm = {(None if pd.isna(k) else k): (v, n, m) for k, v, n, m in
          want.itertuples(index=False)}
    assert gm == wm
