"""CSV / JSONL ingest: byte-exact text round-trips through the sharded
Ray writers and parallel readers, including adversarial content the
formats must quote/escape (delimiters, quotes, newlines, unicode)."""

import shutil

import pyarrow as pa
import pytest


ADVERSARIAL = [
    "plain words here",
    'commas, "quotes", and ,,delimiters,,',
    "embedded\nnewline and\ttab",
    'a "fully quoted" value, with trailing comma,',
    "unicode: café 日本語 \U0001f600 naïve",
    "backslash \\ and \\n literal, plus 'singles'",
    " leading and trailing spaces ",
    "trailing backslash \\",
]


def _docs_table():
    n = len(ADVERSARIAL)
    return pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
        "text": pa.array(ADVERSARIAL),
    })


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_adversarial_roundtrip(ray_session, tmp_path, fmt):
    import ray.data

    from tokrle.sources.text_formats import (read_documents_csv,
                                             read_documents_jsonl,
                                             write_documents_csv,
                                             write_documents_jsonl)

    out = str(tmp_path / fmt)
    ds = ray.data.from_arrow(_docs_table())
    if fmt == "csv":
        write_documents_csv(ds, out)
        back = read_documents_csv(out, columns=["doc_id", "source", "text"])
    else:
        write_documents_jsonl(ds, out)
        back = read_documents_jsonl(out,
                                    columns=["doc_id", "source", "text"])
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "source", "text"]
    assert got["doc_id"].tolist() == list(range(len(ADVERSARIAL)))
    assert got["text"].tolist() == ADVERSARIAL
    shutil.rmtree(out, ignore_errors=True)


def test_missing_column_raises(ray_session, tmp_path):
    import ray.data

    from tokrle.sources.text_formats import (read_documents_csv,
                                             write_documents_csv)

    out = str(tmp_path / "missing")
    write_documents_csv(ray.data.from_arrow(_docs_table()), out)
    rd = read_documents_csv(out, columns=["doc_id", "nope"])
    with pytest.raises(Exception, match="nope"):
        rd.take_all()


def test_ingest_to_parquet(ray_session, tmp_path):
    import ray.data

    from tokrle.sources.text_formats import (ingest_to_parquet,
                                             write_documents_jsonl)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_documents_jsonl(ray.data.from_arrow(_docs_table()), src)
    ingest_to_parquet(src, dst, fmt="jsonl",
                      columns=["doc_id", "source", "text"])
    got = ray.data.read_parquet(dst, columns=["text", "doc_id"]) \
        .to_pandas().sort_values("doc_id")
    assert got["text"].tolist() == ADVERSARIAL


from hypothesis import given, settings
from hypothesis import strategies as st

# exclude the two classes JSON/CSV legitimately cannot carry in a text
# column: surrogates (invalid UTF-8) and NUL (C-string terminator in
# the Arrow CSV parser) — everything else must survive byte-exact
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=80)


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_hypothesis_unicode_roundtrip(ray_session, tmp_path_factory, texts):
    import ray.data

    from tokrle.sources.text_formats import (read_documents_jsonl,
                                             write_documents_jsonl)

    out = str(tmp_path_factory.mktemp("hyp"))
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "source": pa.array(["s"] * len(texts)),
        "text": pa.array(texts),
    })
    write_documents_jsonl(ray.data.from_arrow(t), out)
    got = read_documents_jsonl(out, columns=["doc_id", "text"]) \
        .to_pandas().sort_values("doc_id")
    assert got["text"].fillna("").tolist() == texts
