"""Pin the reference's own doctest examples (pyrle/rle.py) as parity specs:
exact runs/values outputs for construction, arithmetic, comparisons,
zero-extension, and scalar ops."""

import numpy as np

from tokrle.rle import Rle


def check(rle, runs, values):
    assert np.array_equal(rle.runs, runs), (rle.runs, runs)
    assert np.allclose(rle.values, values, equal_nan=True), (rle.values, values)


def test_construction_from_values_vector():
    # pyrle/rle.py:105-113
    r2 = Rle([1, 1, 1, 0, 0, 2, 2, 3, 4, 2])
    check(r2, [3, 2, 2, 1, 1, 1], [1, 0, 2, 3, 4, 2])


def test_sub_with_zero_extension():
    # pyrle/rle.py:116-123
    r = Rle([1, 2, 1, 5], [0, 2.1, 3, 4])
    r2 = Rle([1, 1, 1, 0, 0, 2, 2, 3, 4, 2])
    check(r - r2, [1, 2, 1, 1, 2, 1, 1, 1],
          [-1.0, 1.1, 3.0, 4.0, 2.0, 1.0, 0.0, -2.0])


def test_scalar_mul():
    # pyrle/rle.py:126-133
    r = Rle([1, 2, 1, 5], [0, 2.1, 3, 4])
    check(r * 5, [1, 2, 1, 5], [0.0, 10.5, 15.0, 20.0])


def test_add_doctest():
    # pyrle/rle.py:178-192
    r1 = Rle([1, 2], [0, 1])
    r2 = Rle([2, 2], [2, 3])
    check(r1 + r2, [1, 1, 1, 1], [2.0, 3.0, 4.0, 3.0])
    check(r1 * 10, [1, 2], [0.0, 10.0])


def test_eq_doctests():
    # pyrle/rle.py:253-268
    r = Rle([1, 2, 1], [1, 2, 3])
    r2 = Rle([1, 1, 1], [1, 2, 1])
    check(r == r2, [2, 2], [1.0, 0.0])
    check(r == 3, [3, 1], [0.0, 1.0])


def test_ge_doctests():
    # pyrle/rle.py:348-364
    r = Rle([1, 2, 3], [0, 2, 1])
    r2 = Rle([2, 1, 2], [2, 1, 2])
    check(r >= r2, [1, 2, 2, 1], [0.0, 1.0, 0.0, 1.0])
    check(r >= 1, [1, 5], [0.0, 1.0])


def test_mul_doctest():
    # pyrle/rle.py:475-489
    r1 = Rle([1, 2], [0, 1])
    r2 = Rle([2, 2], [2, 3])
    check(r1 * r2, [1, 1, 1, 1], [0.0, 2.0, 3.0, 0.0])


def test_sub_scalar_doctest():
    # pyrle/rle.py:682-699
    r1 = Rle([1, 2], [0, 1])
    r2 = Rle([2, 2], [2, 3])
    check(r1 - r2, [1, 1, 1, 1], [-2.0, -1.0, -2.0, -3.0])
    check(r1 - 10, [1, 2], [-10.0, -9.0])


def test_div_doctests():
    # pyrle/rle.py:710-724
    r1 = Rle([1, 2], [0, 1])
    r2 = Rle([2, 2], [2, 3])
    check(r1 / r2, [1, 1, 1, 1], [0.0, 0.5, 1 / 3, 0.0])
    check(r1 / 10, [1, 2], [0.0, 0.1])


def test_neg_doctest():
    # pyrle/rle.py:529-544
    r = Rle([1, 2, 3], [5, -20, 1])
    check(-r, [1, 2, 3], [-5.0, 20.0, -1.0])


def test_reflected_scalar_doctests():
    # pyrle/rle.py:556-618
    check(5 + Rle([1, 2], [3, 4]), [1, 2], [8.0, 9.0])
    check(5 * Rle([1, 2], [0.5, 1]), [1, 2], [2.5, 5.0])
    check(5 - Rle([1, 2], [0.5, 1]), [1, 2], [4.5, 4.0])
    check(5 / Rle([1, 2], [0.5, 1]), [1, 2], [10.0, 5.0])


def test_ufunc_doctest():
    # pyrle/rle.py:214-238
    r = Rle([1, 2, 3, 4], [1, 4, 9, 16])
    check(np.sqrt(r), [1, 2, 3, 4], [1.0, 2.0, 3.0, 4.0])


def test_rledict_reflected_scalar():
    # pyrle/rledict.py:320-327: scalar - rd and scalar / rd, per key
    from tokrle.rledict import RleDict

    rd = RleDict({"chr1": Rle([1, 2], [0.5, 1.0]),
                  "chr2": Rle([3], [2.0])})
    sub = 1 - rd
    check(sub["chr1"], [1, 2], [0.5, 0.0])
    check(sub["chr2"], [3], [-1.0])
    div = 1 / rd
    check(div["chr1"], [1, 2], [2.0, 1.0])
    check(div["chr2"], [3], [0.5])


def test_getlocs_public_api():
    # pyrle/rle.py:336-340: list of positions -> values at sorted positions
    r = Rle([3, 2, 4], [1.0, 5.0, 2.0])
    # logical vector: 1 1 1 5 5 2 2 2 2
    assert r.getlocs([0, 4, 8]).tolist() == [1.0, 5.0, 2.0]
    # unsorted input is sorted first (reference semantics)
    assert r.getlocs([8, 0, 4]).tolist() == [1.0, 5.0, 2.0]
    assert r[[1, 3]].tolist() == [1.0, 5.0]


def test_package_root_api_parity(tmp_path):
    # reference package-root surface (pyrle/__init__.py:1-29): Rle,
    # RleDict, PyRles alias, from_csv, __version__ importable from root
    import tokrle
    from tokrle import PyRles, Rle, RleDict, from_csv

    assert PyRles is RleDict
    assert isinstance(tokrle.__version__, str) and tokrle.__version__

    rd = PyRles({"chr1": Rle([2, 3], [1.0, 4.0]),
                 "chr2": Rle([7], [2.5])})
    p = tmp_path / "rles.tsv"
    rd.to_csv(p)  # reference default sep is "\t" (pyrle/rledict.py:705)
    assert "\t" in p.read_text().splitlines()[0]
    assert from_csv(p) == rd
