"""PyRanges-shaped interop (ref pyrle/rledict.py:256-294, pyrle/rle.py:
300-335): the shims are duck-typed on ``.df`` so they work without the
pyranges package (absent from this container); when pyranges IS importable
results are wrapped back into PyRanges."""

import numpy as np
import pandas as pd

from tokrle.rle import Rle
from tokrle.rledict import RleDict


class FakePyRanges:
    """Minimal PyRanges stand-in: holds an interval frame under .df."""

    def __init__(self, df: pd.DataFrame):
        self.df = df


def _ivl(chrom="chr1", starts=(0, 4), ends=(6, 10)):
    return pd.DataFrame({"Chromosome": chrom,
                         "Start": list(starts), "End": list(ends)})


def test_rledict_from_pyranges_like():
    gr = FakePyRanges(_ivl())
    rd = RleDict(gr)
    ref = RleDict(_ivl())
    assert rd == ref
    assert rd["chr1"].to_array().tolist() == \
        np.array([1, 1, 1, 1, 2, 2, 1, 1, 1, 1]).tolist()


def test_rledict_getitem_pyranges_like():
    rd = RleDict(_ivl())
    q = FakePyRanges(pd.DataFrame({"Chromosome": "chr1",
                                   "Start": [2], "End": [7]}))
    out = rd[q]
    want = rd[q.df]
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  want.reset_index(drop=True))
    assert set(["Chromosome", "Start", "End", "ID", "Run", "Value"]) \
        <= set(out.columns)


def test_rle_getitem_pyranges_like():
    r = Rle([3, 2, 5], [1.0, 3.0, 2.0])
    q = FakePyRanges(pd.DataFrame({"Chromosome": ["c"], "Strand": ["+"],
                                   "Start": [1], "End": [7]}))
    out = r[q]
    assert out["Chromosome"].iloc[0] == "c"
    assert out["Strand"].iloc[0] == "+"
    plain = r[pd.DataFrame({"Start": [1], "End": [7]})]
    assert out["Run"].tolist() == plain["Run"].tolist()
    assert out["Value"].tolist() == plain["Value"].tolist()


def test_rle_getitem_pyranges_like_empty():
    r = Rle([3], [1.0])
    out = r[FakePyRanges(pd.DataFrame(columns=["Chromosome", "Start",
                                               "End"]))]
    assert out.empty
    assert list(out.columns) == ["Chromosome", "Start", "End", "ID",
                                 "Run", "Value"]


def test_to_ranges_roundtrip_shape():
    rd = RleDict(_ivl())
    out = rd.to_ranges()          # DataFrame here (no pyranges package)
    assert isinstance(out, pd.DataFrame)
    back = RleDict(out, value_col="Score")
    assert back == rd
