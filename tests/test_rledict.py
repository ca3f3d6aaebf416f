"""RleDict parity tests: coverage construction, keyed binary ops with
zero-Rle fill for missing keys, strand handling, decode — property-tested
against dense NumPy oracles (mirrors reference tests/test_hypothesis_coverage.py
and tests/test_hypothesis.py:91-113)."""

import numpy as np
import pandas as pd
from hypothesis import given
from hypothesis import strategies as st

from tokrle.rle import Rle
from tokrle.rledict import RleDict, from_csv

CHROMS = ["chr1", "chr2", "chrX"]


@st.composite
def interval_df(draw, stranded=False):
    n = draw(st.integers(1, 15))
    rows = []
    for _ in range(n):
        start = draw(st.integers(0, 50))
        length = draw(st.integers(1, 20))
        row = {"Chromosome": draw(st.sampled_from(CHROMS)),
               "Start": start, "End": start + length}
        if stranded:
            row["Strand"] = draw(st.sampled_from(["+", "-"]))
        rows.append(row)
    return pd.DataFrame(rows)


def dense_coverage(df, chrom):
    sub = df[df.Chromosome == chrom]
    if len(sub) == 0:
        return np.zeros(0)
    hi = int(sub.End.max())
    out = np.zeros(hi)
    for s, e in zip(sub.Start, sub.End):
        out[s:e] += 1
    return out


@given(interval_df())
def test_coverage_construction_vs_dense(df):
    rd = RleDict(df)
    for chrom in df.Chromosome.unique():
        dense = dense_coverage(df, chrom)
        got = rd[chrom].to_array()
        assert np.allclose(got, dense)


@given(interval_df(), interval_df())
def test_keyed_add_and_commutativity(df1, df2):
    a = RleDict(df1)
    b = RleDict(df2)
    assert (a + b) == (b + a)
    assert (a * b) == (b * a)
    # per-key values: union of keys; missing side treated as zeros
    s = a + b
    for k in set(a.rles) | set(b.rles):
        d1 = dense_coverage(df1, k)
        d2 = dense_coverage(df2, k)
        n = max(len(d1), len(d2))
        expected = np.pad(d1, (0, n - len(d1))) + np.pad(d2, (0, n - len(d2)))
        assert np.allclose(s[k].to_array(), expected)


@given(interval_df())
def test_scalar_ops(df):
    rd = RleDict(df)
    out = rd * 3 + 1
    for k, r in rd.items():
        assert np.allclose(out[k].to_array(), r.to_array() * 3 + 1)


def test_stranded_construction_and_unstrand():
    df = pd.DataFrame({
        "Chromosome": ["chr1", "chr1", "chr1"],
        "Start": [0, 2, 5],
        "End": [4, 6, 9],
        "Strand": ["+", "-", "+"],
    })
    rd = RleDict(df, stranded=True)
    assert rd.stranded
    assert set(rd.rles) == {("chr1", "+"), ("chr1", "-")}
    flat = rd.unstrand()
    assert np.allclose(flat["chr1"].to_array(),
                       dense_coverage(df.drop(columns="Strand"), "chr1"))
    # mixed-strandedness binary op harmonizes by collapsing strands
    other = RleDict(df.drop(columns="Strand"))
    s = rd + other
    assert not s.stranded
    assert np.allclose(s["chr1"].to_array(),
                       2 * dense_coverage(df.drop(columns="Strand"), "chr1"))


def test_to_ranges_roundtrip():
    df = pd.DataFrame({"Chromosome": ["chr1"] * 3, "Start": [0, 2, 10],
                       "End": [4, 6, 12]})
    rd = RleDict(df)
    ranges = rd.to_ranges()
    # zero-score gaps dropped (ref pyrle/methods.py:166,177)
    assert (ranges.Score != 0).all()
    rebuilt = RleDict(ranges.rename(columns={"Score": "V"}), value_col="V")
    assert rebuilt == rd


def test_make_strands_same_length():
    rd = RleDict({("chr1", "+"): Rle([5], [1.0]),
                  ("chr1", "-"): Rle([3], [2.0])})
    out = rd.make_strands_same_length()
    assert out[("chr1", "+")].length == out[("chr1", "-")].length == 5


def test_add_pseudocounts():
    rd = RleDict({"chr1": Rle([2, 3], [0.0, 4.0])})
    out = rd.add_pseudocounts(0.5)
    assert np.allclose(out["chr1"].values, [0.5, 4.0])


def test_csv_roundtrip(tmp_path):
    rd = RleDict({"chr1": Rle([2, 3], [1.0, 4.0]),
                  "chr2": Rle([7], [2.5])})
    p = tmp_path / "rles.csv"
    rd.to_csv(p)
    assert from_csv(p) == rd


def test_getitem_unstranded_key_on_stranded_dict():
    rd = RleDict({("chr1", "+"): Rle([5], [1.0]),
                  ("chr1", "-"): Rle([3], [2.0])})
    sub = rd["chr1"]
    assert isinstance(sub, RleDict) and len(sub) == 2


def test_binop_keyed_matches_rledict(ray_session):
    """The distributed keyed RLE table ops must equal the in-memory RleDict
    ops on the same intervals (cross-layer consistency)."""
    import ray.data

    from tokrle.pipelines.rle_table import binop_keyed, coverage_by_key

    rng = np.random.RandomState(11)
    n = 60
    df = pd.DataFrame({
        "key": rng.choice(["a", "b", "c"], size=n),
        "start": rng.randint(0, 200, size=n),
    })
    df["end"] = df["start"] + rng.randint(1, 40, size=n)
    da = df.iloc[::2].reset_index(drop=True)
    db = df.iloc[1::2].reset_index(drop=True)

    a = coverage_by_key(ray.data.from_pandas(da), "key", "start", "end")
    b = coverage_by_key(ray.data.from_pandas(db), "key", "start", "end")
    got = binop_keyed(a, b, "add").to_pandas().set_index("key")

    ra = RleDict(da.rename(columns={"key": "Chromosome", "start": "Start",
                                    "end": "End"}))
    rb = RleDict(db.rename(columns={"key": "Chromosome", "start": "Start",
                                    "end": "End"}))
    want = ra + rb
    assert set(got.index) == set(k for k, _ in want.items())
    for k, rle in want.items():
        assert np.array_equal(np.asarray(got.loc[k, "runs"]), rle.runs), k
        assert np.allclose(np.asarray(got.loc[k, "values"]), rle.values), k
