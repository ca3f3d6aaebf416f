"""Distributed BPE: vectorized merge/expand kernels vs the sequential
greedy reference, end-to-end training parity, and the lossless
merge-table round-trip."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokrle.functions.bpe import (apply_merge_flat, expand_merge_flat,
                                  reference_apply_merge,
                                  reference_train_bpe)


def _flat(docs):
    values = np.concatenate([np.asarray(d, dtype=np.int32) for d in docs]) \
        if any(len(d) for d in docs) else np.empty(0, dtype=np.int32)
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    return values, offsets


def _unflat(values, lens):
    out, p = [], 0
    for ln in lens:
        out.append(values[p:p + ln].tolist())
        p += ln
    return out


CASES = [
    [[1, 2, 1, 2, 1, 2]],                 # chained overlaps of (1,2)? no: (2,1) between
    [[1, 1, 1, 1]],                        # a==b run, even length
    [[1, 1, 1]],                           # a==b run, odd length
    [[1, 2], [2, 1], [], [1, 2, 3, 1, 2]],  # boundaries + empty doc
    [[5]],
    [[], []],
    [[1, 2, 2, 2, 1, 2]],
]


@pytest.mark.parametrize("docs", CASES)
@pytest.mark.parametrize("pair", [(1, 2), (1, 1), (2, 2), (2, 1)])
def test_apply_merge_matches_reference(docs, pair):
    a, b = pair
    values, offsets = _flat(docs)
    got_v, got_l, n_merged = apply_merge_flat(values, offsets, a, b, 99)
    want = [reference_apply_merge(d, a, b, 99) for d in docs]
    assert _unflat(got_v, got_l) == want
    assert n_merged == sum(len(d) - len(w) for d, w in zip(docs, want))


@given(st.lists(st.lists(st.integers(min_value=0, max_value=3),
                         max_size=30), max_size=6),
       st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_hypothesis_apply_merge_parity(docs, a, b):
    values, offsets = _flat(docs)
    got_v, got_l, _ = apply_merge_flat(values, offsets, a, b, 99)
    want = [reference_apply_merge(d, a, b, 99) for d in docs]
    assert _unflat(got_v, got_l) == want


@given(st.lists(st.lists(st.integers(min_value=0, max_value=3),
                         max_size=30), max_size=6),
       st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=100, deadline=None)
def test_hypothesis_expand_inverts_apply(docs, a, b):
    values, offsets = _flat(docs)
    merged_v, merged_l, _ = apply_merge_flat(values, offsets, a, b, 99)
    moffs = np.zeros(len(merged_l) + 1, dtype=np.int64)
    np.cumsum(merged_l, out=moffs[1:])
    back_v, back_l = expand_merge_flat(merged_v, moffs, a, b, 99)
    assert _unflat(back_v, back_l) == [list(d) for d in docs]


def test_train_bpe_matches_reference_end_to_end(ray_session):
    import ray.data

    from tokrle.functions.bpe import apply_bpe, expand_bpe, train_bpe

    rng = np.random.default_rng(5)
    docs = [rng.integers(0, 6, rng.integers(0, 40)).tolist()
            for _ in range(60)]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)

    merges, merged_ds = train_bpe(ds, 8, first_new_id=100)
    want_merges, want_docs = reference_train_bpe(docs, 8, 100)
    assert merges == want_merges
    assert len(merges) >= 3          # the corpus must actually train

    got = {r["doc_id"]: list(r["tokens"])
           for r in merged_ds.take_all()}
    assert got == {f"d{i}": d for i, d in enumerate(want_docs)}

    # apply_bpe on the ORIGINAL corpus reproduces the trained corpus,
    # and expand_bpe inverts it bit-identically
    applied = apply_bpe(ds, merges)
    got2 = {r["doc_id"]: list(r["tokens"]) for r in applied.take_all()}
    assert got2 == got
    back = expand_bpe(applied, merges)
    got3 = {r["doc_id"]: list(r["tokens"]) for r in back.take_all()}
    assert got3 == {f"d{i}": list(d) for i, d in enumerate(docs)}


def test_train_bpe_deterministic_tiebreak(ray_session):
    import ray.data

    from tokrle.functions.bpe import train_bpe

    # (1,2) and (3,4) both appear twice: smallest pair must win
    tbl = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "tokens": pa.array([[3, 4, 1, 2], [3, 4, 1, 2]],
                           type=pa.list_(pa.int32())),
    })
    merges, _ = train_bpe(ray.data.from_arrow(tbl), 1, first_new_id=10)
    assert (merges[0]["pair_a"], merges[0]["pair_b"]) == (1, 2)
    assert merges[0]["pair_count"] == 2


def test_train_bpe_checkpoint_resume(ray_session, tmp_path):
    """Training 3 rounds, then resuming to 6 from the checkpoint, must
    produce the identical merge table and corpus as an uninterrupted
    6-round run; mixing id spaces must be refused."""
    import ray.data

    from tokrle.functions.bpe import train_bpe

    rng = np.random.default_rng(8)
    docs = [rng.integers(0, 5, rng.integers(2, 30)).tolist()
            for _ in range(50)]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    ckpt = str(tmp_path / "merges.json")

    full, full_ds = train_bpe(ds, 6, first_new_id=100)
    part, _ = train_bpe(ds, 3, first_new_id=100, checkpoint_path=ckpt)
    assert part == full[:3]
    resumed, resumed_ds = train_bpe(ds, 6, first_new_id=100,
                                    checkpoint_path=ckpt)
    assert resumed == full
    a = {r["doc_id"]: list(r["tokens"]) for r in full_ds.take_all()}
    b = {r["doc_id"]: list(r["tokens"]) for r in resumed_ds.take_all()}
    assert a == b

    with pytest.raises(ValueError, match="id spaces"):
        train_bpe(ds, 6, first_new_id=999, checkpoint_path=ckpt)
