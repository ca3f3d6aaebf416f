"""Regression tests for the ragged-segment edge cases found in round-1
review (ADVICE.md): trailing empty segments, trailing-space shingles,
zero-doc chunks mid-batch, >2^31-token offset merges, and the UTF-8
first-code-point / char-length token contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given
from hypothesis import strategies as st

from tokrle.kernels.segments import segment_sums


def test_segment_sums_trailing_empty_segment():
    # ADVICE repro: lengths [3, 0] over values [10, 20, 30] must give
    # [60, 0], not [30, ...] as the clamped-reduceat idiom produced
    values = np.array([10, 20, 30], dtype=np.int64)
    offsets = np.array([0, 3, 3], dtype=np.int64)
    assert segment_sums(values, offsets).tolist() == [60, 0]


def test_segment_sums_empty_segments_everywhere():
    values = np.array([1, 2, 4], dtype=np.int64)
    offsets = np.array([0, 0, 1, 1, 3, 3], dtype=np.int64)
    assert segment_sums(values, offsets).tolist() == [0, 1, 0, 6, 0]


def test_segment_sums_no_values():
    out = segment_sums(np.empty(0, dtype=np.int64),
                       np.zeros(4, dtype=np.int64))
    assert out.tolist() == [0, 0, 0]


@given(st.lists(st.integers(0, 5), min_size=0, max_size=12))
def test_segment_sums_matches_python(lengths):
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    values = np.arange(offsets[-1], dtype=np.int64) * 3 + 1
    got = segment_sums(values, offsets)
    want = [int(values[offsets[i]:offsets[i + 1]].sum())
            for i in range(len(lengths))]
    assert got.tolist() == want


def test_word_shingles_trailing_space():
    # ADVICE repro: 'a b ' has a trailing empty word -> the old reduceat
    # path raised IndexError
    from tokrle.functions.dedup import _word_shingles_hashed

    hashes, offsets = _word_shingles_hashed(pa.array(["a b "]), 3)
    assert len(offsets) == 2
    assert offsets[-1] == len(hashes)


def test_fingerprint_trailing_empty_doc_batch_invariant():
    # per-doc fingerprints must not depend on batch boundaries even when a
    # batch ends with zero-token docs (ADVICE item 2)
    from tokrle.functions.text import fingerprint_batch

    def table(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tokens": pa.array([r[1] for r in rows],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array(["s"] * len(rows), type=pa.string()),
        })

    rows = [("a", [10, 20, 30]), ("b", []), ("c", [7]), ("d", [])]
    whole = fingerprint_batch(table(rows)).to_pandas()
    split = pd.concat([fingerprint_batch(table(rows[:2])).to_pandas(),
                       fingerprint_batch(table(rows[2:])).to_pandas()],
                      ignore_index=True)
    pd.testing.assert_frame_equal(whole, split)
    # the non-empty doc before an empty one keeps its full fingerprint
    assert whole.loc[whole.doc_id == "a", "fingerprint"].iloc[0] != 30


def test_merge_row_offsets_zero_doc_chunk_mid_batch():
    from tokrle.stages.encoder import _merge_row_offsets

    out = _merge_row_offsets([np.array([0, 3, 5]), np.array([0]),
                              np.array([0, 2])])
    assert out.tolist() == [0, 3, 5, 7]


def test_merge_row_offsets_over_int32():
    from tokrle.stages.encoder import _merge_row_offsets

    big = 1 << 31
    out = _merge_row_offsets([np.array([0, big]), np.array([0, big])])
    assert out.dtype == np.int64
    assert out.tolist() == [0, big, 2 * big]


def test_tokenize_matches_duckdb_on_non_ascii():
    # the SQL contract token = ascii(w)*32 + length(w) must hold for
    # multibyte leading characters and multibyte lengths (ADVICE item 3)
    import duckdb

    from tokrle.sources.tokens import tokenize_batch

    texts = ["héllo wörld", "日本語 テスト x", "café ", "naïve résumé mix",
             "plain ascii words", ""]
    batch = pa.table({
        "doc_id": pa.array([str(i) for i in range(len(texts))]),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
    })
    got = tokenize_batch(batch)
    flat_got = [t for row in got.column("tokens").to_pylist() for t in row]
    con = duckdb.connect()
    con.register("t", batch.select(["doc_id", "text"]))
    want = [r[0] for r in con.execute(
        "SELECT ascii(w) * 32 + length(w) FROM ("
        "SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM t "
        "ORDER BY cast(doc_id AS int))").fetchall()]
    assert flat_got == want


def test_binop_keyed_duplicate_key_rows_fail_loudly(ray_session):
    import ray.data

    from tokrle.pipelines.rle_table import binop_keyed

    good = ray.data.from_pandas(pd.DataFrame(
        {"key": ["k"], "runs": [[4]], "values": [[1.0]]}))
    dup = ray.data.from_pandas(pd.DataFrame(
        {"key": ["k", "k"], "runs": [[4], [2]], "values": [[1.0], [2.0]]}))
    with pytest.raises(Exception, match="one row per key"):
        binop_keyed(good, dup, "add").to_pandas()


def test_tokenize_sliced_batch_matches_full():
    # Arrow array offsets (non-zero .offset after Table.slice) must not
    # shift the buffer math in tokenize_batch
    from tokrle.sources.tokens import tokenize_batch

    texts = ["héllo wörld", "a b c", "", "日本語 x", "tail words here"]
    batch = pa.table({
        "doc_id": pa.array([str(i) for i in range(len(texts))]),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
    })
    full = tokenize_batch(batch).to_pandas()
    sliced = tokenize_batch(batch.slice(1, 3)).to_pandas()
    want = full.iloc[1:4].reset_index(drop=True)
    assert sliced["tokens"].map(list).tolist() == \
        want["tokens"].map(list).tolist()


def test_codec_decode_accepts_memoryview():
    # decode_chunks hands codecs a zero-copy memoryview; every codec must
    # read through the buffer protocol
    from tokrle.codecs.core import CODECS, decode, encode

    rng = np.random.default_rng(11)
    x = (rng.zipf(1.3, 20000) % 32000).astype(np.int32)
    for name in CODECS:
        payload = encode(name, x)
        out = decode(name, memoryview(payload), len(x), np.int32)
        assert np.array_equal(out, x), name


def test_coverage_by_key_giant_key_skew(ray_session):
    """One key holding 90% of all intervals (plus empty-side binop keys)
    must produce dense-oracle-identical coverage through the block-fold
    path — the r3 replacement for per-key map_groups — without the fold
    ever seeing more than its block."""
    import ray.data

    from tokrle.pipelines.rle_table import (aggregate_keyed,
                                            coverage_by_key)

    rng = np.random.default_rng(5)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, "giant",
                    rng.choice(["a", "b", "c"], n))
    starts = rng.integers(0, 5_000, n)
    ends = starts + 1 + rng.integers(0, 200, n)
    df = pd.DataFrame({"k": keys, "s": starts, "e": ends})
    cov = coverage_by_key(ray.data.from_pandas(df).repartition(8),
                          "k", "s", "e")
    out = aggregate_keyed(cov).to_pandas().set_index("key")
    for key in ("giant", "a", "b", "c"):
        sel = df[df["k"] == key]
        dense = np.zeros(int(sel["e"].max()), dtype=np.int64)
        for s, e in zip(sel["s"], sel["e"]):
            dense[s:e] += 1
        assert out.loc[key, "total"] == dense.sum()
        assert out.loc[key, "max_value"] == dense.max()
        assert out.loc[key, "length"] == len(dense)


def test_rle_table_emits_large_list_arrow(ray_session):
    """List columns must be Arrow large_list (zero-copy packed), not
    per-row Python lists round-tripped through object dtype."""
    import ray.data

    from tokrle.pipelines.rle_table import coverage_by_key

    df = pd.DataFrame({"k": ["x", "x", "y"], "s": [0, 5, 2],
                       "e": [4, 9, 6]})
    cov = coverage_by_key(ray.data.from_pandas(df), "k", "s", "e")
    schema = cov.schema()
    t = dict(zip(schema.names, schema.types))
    assert pa.types.is_large_list(t["runs"])
    assert pa.types.is_large_list(t["values"])
