"""Edge-shape tests through the full Ray encode/decode pipeline: empty
docs, empty tables, negative tokens, single huge doc, single-token docs."""

import numpy as np
import pyarrow as pa
import pytest


def _table(docs: dict[str, list[int]], source: str = "s") -> pa.Table:
    ids = list(docs)
    toks = [docs[d] for d in ids]
    offsets = np.concatenate(([0], np.cumsum([len(t) for t in toks])))
    flat = [x for t in toks for x in t]
    return pa.table({
        "doc_id": pa.array(ids, type=pa.string()),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(flat, type=pa.int32())),
        "n_tok": pa.array([len(t) for t in toks], type=pa.int32()),
        "source": pa.array([source] * len(ids), type=pa.string()),
    })


def _roundtrip(ray_session, table: pa.Table):
    import ray.data

    from tokrle.pipelines.encode import decode_tokens, encode_tokens

    ds = ray.data.from_arrow(table)
    dec = decode_tokens(encode_tokens(ds, batch_size=3)).to_pandas()
    src = {d: np.asarray(t, dtype=np.int32)
           for d, t in zip(table.column("doc_id").to_pylist(),
                           table.column("tokens").to_pylist())}
    got = {d: np.asarray(t) for d, t in zip(dec["doc_id"], dec["tokens"])}
    assert set(got) == set(src)
    for d in src:
        assert got[d].dtype == np.int32
        assert np.array_equal(got[d], src[d]), d


def test_empty_docs_roundtrip(ray_session):
    _roundtrip(ray_session, _table({
        "a": [], "b": [1, 2, 3], "c": [], "d": [7],
    }))


def test_all_empty_docs(ray_session):
    _roundtrip(ray_session, _table({"a": [], "b": [], "c": []}))


def test_negative_tokens_roundtrip(ray_session):
    _roundtrip(ray_session, _table({
        "a": [-5, -5, -5, 100], "b": [-2**31, 2**31 - 1, 0],
        "c": [-1] * 50,
    }))


def test_single_huge_doc(ray_session):
    rng = np.random.default_rng(5)
    big = rng.integers(0, 1000, size=200_000).astype(np.int32).tolist()
    _roundtrip(ray_session, _table({"big": big, "tiny": [3]}))


def test_single_token_docs(ray_session):
    _roundtrip(ray_session, _table({f"d{i}": [i] for i in range(50)}))


def test_empty_dataset(ray_session):
    import ray.data

    from tokrle.pipelines.encode import decode_tokens, encode_tokens

    t = _table({})
    dec = decode_tokens(encode_tokens(ray.data.from_arrow(t), batch_size=4))
    assert dec.count() == 0


def test_codec_edge_negative_span():
    """Chunk whose span crosses the int32 extremes must round-trip through
    every applicable codec."""
    from tokrle.codecs.core import CODECS, decode, encode

    x = np.array([-2**31, 2**31 - 1, 0, -1, 1], dtype=np.int32)
    for codec in CODECS:
        if codec == "bitpack":
            continue
        out = decode(codec, encode(codec, x), len(x), x.dtype)
        assert np.array_equal(out, x), codec
