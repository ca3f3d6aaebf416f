"""Bloom filter: one-sided membership contract, distributed build, and
the contamination prefilter's superset guarantee vs the exact path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tokrle.functions.bloom import (bitmap_set, bitmap_test, build_bloom,
                                    optimal_params)


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(2)
    n = 20000
    h1 = rng.integers(-2**63, 2**63 - 1, n).astype(np.int64)
    h2 = rng.integers(-2**63, 2**63 - 1, n).astype(np.int64)
    n_bits, k = optimal_params(n, 0.01)
    bm = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    bitmap_set(bm, h1, h2, k)
    assert bitmap_test(bm, h1, h2, k).all()          # NO false negatives
    q1 = rng.integers(-2**63, 2**63 - 1, 50000).astype(np.int64)
    q2 = rng.integers(-2**63, 2**63 - 1, 50000).astype(np.int64)
    fpr = bitmap_test(bm, q1, q2, k).mean()
    assert fpr < 0.03, fpr                            # ~1% target, 3x slack


def test_build_bloom_distributed_matches_local(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    n = 5000
    h1 = rng.integers(-2**62, 2**62, n).astype(np.int64)
    h2 = rng.integers(-2**62, 2**62, n).astype(np.int64)
    n_bits, k = optimal_params(n, 0.01)
    ds = ray.data.from_arrow(pa.table({"h1": pa.array(h1),
                                       "h2": pa.array(h2)})).repartition(6)
    bm_dist = build_bloom(ds, n_bits=n_bits, k=k)
    bm_local = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    bitmap_set(bm_local, h1, h2, k)
    assert np.array_equal(bm_dist, bm_local)          # OR-fold is exact


def test_bloom_contamination_superset_of_exact(ray_session):
    import ray.data

    from tokrle.functions.bloom import flag_contaminated_bloom
    from tokrle.functions.decontam import flag_contaminated

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    mk = lambda n: " ".join(rng.choice(words, n))
    eval_texts = [mk(20) for _ in range(10)]
    train_texts = [mk(30) for _ in range(60)]
    # plant exact eval n-grams into some training docs
    for i in (3, 17, 41):
        train_texts[i] = train_texts[i] + " " + eval_texts[i % 10]
    eval_ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(10), "text": eval_texts}))
    train_ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(60), "text": train_texts})).repartition(4)

    def ids(ds):
        df = ds.to_pandas()
        return set(df.loc[df["contaminated"], "doc_id"])

    exact = ids(flag_contaminated(train_ds, eval_ds, k=8))
    bloom = ids(flag_contaminated_bloom(train_ds, eval_ds, k=8, fpr=0.01))
    assert {3, 17, 41} <= exact
    assert exact <= bloom                             # one-sided, end to end


def test_flag_contaminated_falls_through_to_bloom_over_cap(ray_session):
    """An eval index over the broadcast cap must take the bloom path
    automatically and stay a SUPERSET of the exact flagger (r4 verdict
    item 7)."""
    import pandas as pd
    import ray.data

    from tokrle.functions.decontam import flag_contaminated

    words = [f"w{i}" for i in range(40)]
    rng = __import__("numpy").random.default_rng(7)
    eval_texts = [" ".join(rng.choice(words, 12)) for _ in range(20)]
    train_texts = eval_texts[:5] + \
        [" ".join(rng.choice(words, 12)) for _ in range(30)]
    train = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(train_texts)), "text": train_texts}))
    ev = ray.data.from_pandas(pd.DataFrame({"text": eval_texts}))

    exact = flag_contaminated(train, ev, k=8).to_pandas() \
        .sort_values("doc_id")
    # cap of 0 forces the bloom fall-through
    bloom = flag_contaminated(train, ev, k=8, max_index_grams=0) \
        .to_pandas().sort_values("doc_id")
    assert bloom.columns.tolist() == exact.columns.tolist()
    # superset invariant: everything exact flags, bloom flags too
    assert (bloom["contaminated"].to_numpy()
            | ~exact["contaminated"].to_numpy()).all()
    assert exact["contaminated"].head(5).all()
