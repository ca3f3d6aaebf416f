"""Inverted index: posting-list exactness vs a brute-force oracle, the
inline short-postings path, bucket-hash build/query agreement, and
pruned partition reads."""

import os

import numpy as np
import pyarrow as pa
import pytest

from tokrle.functions.invindex import (INLINE_MAX, NUM_BUCKETS, _fold_block,
                                       _pairs_batch, _term_hash_vec, search,
                                       term_hash)


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array([str(i) for i in range(len(texts))]),
        "text": pa.array(texts),
    })


def _brute_postings(texts):
    post = {}
    for i, t in enumerate(texts):
        for w in set(t.split(" ")):
            post.setdefault(w, set()).add(i)
    return {w: np.array(sorted(s), dtype=np.int64) for w, s in post.items()}


def test_scalar_and_vector_term_hash_agree():
    terms = ["a", "data", "zz9", "longer-term_string", "", "été"]
    vh = _term_hash_vec(pa.array(terms))
    for i, t in enumerate(terms):
        assert int(vh[i]) == term_hash(t), t


def test_fold_block_inline_and_codec_paths_exact():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    # head terms appear in most docs; tail terms in < INLINE_MAX docs
    texts = []
    for i in range(100):
        words = ["common0", "common1"] + \
            [vocab[j] for j in rng.choice(200, 5, replace=False)]
        texts.append(" ".join(words))
    pairs = _pairs_batch(_docs_table(texts))
    idx = _fold_block(pairs.combine_chunks())
    codecs = idx.column("codec").to_pylist()
    dfs = idx.column("df").to_pylist()
    assert "inline" in codecs and any(c != "inline" for c in codecs)
    for c, df in zip(codecs, dfs):
        assert (c == "inline") == (df < INLINE_MAX)
    from tokrle.functions.invindex import _decode_postings

    got = _decode_postings(idx)
    want = _brute_postings(texts)
    assert set(got) == set(want)
    for w in want:
        assert np.array_equal(got[w], want[w]), w


def test_build_search_end_to_end_and_pruned_read(ray_session, tmp_path):
    import ray

    from tokrle.functions.invindex import build_inverted_index, query_terms

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(50)]
    texts = [" ".join(vocab[j] for j in rng.choice(50, 8, replace=False))
             for _ in range(300)]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(5)
    index_dir = str(tmp_path / "inv")
    build_inverted_index(ds, index_dir)
    want = _brute_postings(texts)
    # every term's postings exact through the pruned query path
    got = query_terms(index_dir, list(want))
    for w in want:
        assert np.array_equal(got[w], want[w]), w
    # AND/OR vs set algebra
    a, b = "t3", "t7"
    and_ids = search(index_dir, [a, b], mode="and")
    or_ids = search(index_dir, [a, b], mode="or")
    assert np.array_equal(and_ids, np.array(
        sorted(set(want[a]) & set(want[b])), np.int64))
    assert np.array_equal(or_ids, np.array(
        sorted(set(want[a]) | set(want[b])), np.int64))
    # missing term -> empty, and the AND collapses
    assert len(query_terms(index_dir, ["nosuchterm"])["nosuchterm"]) == 0
    assert len(search(index_dir, [a, "nosuchterm"], mode="and")) == 0
    # pruned read: only the probed terms' hive bucket partitions exist on
    # the query path — verify the index is actually partitioned and the
    # probed bucket set is a strict subset of all buckets
    buckets_on_disk = {d for d in os.listdir(os.path.join(index_dir, "data"))
                       if d.startswith("bucket=")}
    assert len(buckets_on_disk) > 1
    probed = {f"bucket={term_hash(t) % NUM_BUCKETS}" for t in (a, b)}
    assert probed <= buckets_on_disk
    assert len(probed) < len(buckets_on_disk)
