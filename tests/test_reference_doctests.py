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


def _rd_pair():
    from tokrle.rledict import RleDict

    return RleDict({("chr1", "+"): Rle([1, 1], [1, 2]),
                    ("chr1", "-"): Rle([1, 1], [3, 2.0])})


def test_rledict_iter_doctest():
    # pyrle/rledict.py:200-226: iterates (key, Rle) pairs in key order
    items = list(_rd_pair())
    assert [k for k, _ in items] == [("chr1", "+"), ("chr1", "-")]
    check(items[0][1], [1, 1], [1.0, 2.0])
    check(items[1][1], [1, 1], [3.0, 2.0])


def test_rledict_apply_doctest():
    # pyrle/rledict.py:446-471: apply reverses runs + sqrts values,
    # then defragments
    from tokrle.rledict import RleDict

    r = RleDict({("chr1", "+"): Rle([1, 4], [1, 2]),
                 ("chr1", "-"): Rle([2, 1], [3, 2.0])})

    def nonsense(rle):
        rle.runs = rle.runs[::-1].copy()
        rle.values = np.sqrt(rle.values)
        return rle

    out = r.apply(nonsense)
    check(out[("chr1", "+")], [4, 1], [1.0, 1.4142135381698608])
    check(out[("chr1", "-")], [1, 2],
          [1.7320508075688772, 1.4142135381698608])


def test_rledict_apply_runs_doctest():
    # pyrle/rledict.py:510-535
    from tokrle.rledict import RleDict

    r = RleDict({("chr1", "+"): Rle([1, 4], [1, 2]),
                 ("chr1", "-"): Rle([2, 1], [3, 2.0])})

    def even_times_hundred(runs):
        runs = runs.copy()
        runs[runs % 2 == 0] *= 100
        return runs

    out = r.apply_runs(even_times_hundred)
    check(out[("chr1", "+")], [1, 400], [1.0, 2.0])
    check(out[("chr1", "-")], [200, 1], [3.0, 2.0])


def test_rledict_apply_values_doctest():
    # pyrle/rledict.py:572-593
    out = _rd_pair().apply_values(lambda v, **kw: v ** kw["exponent"],
                                  exponent=3)
    check(out[("chr1", "+")], [1, 1], [1.0, 8.0])
    check(out[("chr1", "-")], [1, 1], [27.0, 8.0])


def test_rledict_to_ranges_doctest():
    # pyrle/rledict.py:715-733: stranded (Chromosome, Start, End,
    # Score, Strand) rows, + before -, zero-score runs kept here (all
    # scores nonzero)
    df = _rd_pair().to_ranges()
    rows = df[["Chromosome", "Start", "End", "Score", "Strand"]] \
        .values.tolist()
    assert rows == [["chr1", 0, 1, 1.0, "+"], ["chr1", 1, 2, 2.0, "+"],
                    ["chr1", 0, 1, 3.0, "-"], ["chr1", 1, 2, 2.0, "-"]]


def test_apply_values_defragment_doctests():
    # pyrle/rle.py:768-795
    r = Rle([1, 3, 5], [100, 200, -300])
    check(r.apply_values(lambda v: np.sqrt(v)),
          [1, 3, 5], [10.0, 14.142135620117188, np.nan])

    def gt0_to_1(v):
        v = v.copy()
        v[v > 0] = 1
        return v

    check(r.apply_values(gt0_to_1, defragment=False),
          [1, 3, 5], [1.0, 1.0, -300.0])
    check(r.apply_values(gt0_to_1, defragment=True),
          [4, 5], [1.0, -300.0])


def test_apply_runs_squared_doctest():
    # pyrle/rle.py:820-828
    r = Rle([1, 3, 5], [100, 200, -300])
    check(r.apply_runs(lambda v: (v ** 2).astype(np.int64)),
          [1, 9, 25], [100.0, 200.0, -300.0])


def test_apply_shuffle_doctest():
    # pyrle/rle.py:852-866 (np.random.seed(0) shuffle is deterministic)
    r = Rle([1, 3, 5], [100, 200, -300])

    def shuffle(rle):
        np.random.seed(0)
        np.random.shuffle(rle.values)
        np.random.shuffle(rle.runs)
        return rle

    check(r.apply(shuffle), [5, 1, 3], [-300.0, 200.0, 100.0])


def test_defragment_after_value_mutation_doctest():
    # pyrle/rle.py:884-909
    r = Rle([1, 2, 3], [1, 0, 1])
    r.values[1] = 1
    r.values[2] = 2
    check(r, [1, 2, 3], [1.0, 1.0, 2.0])
    check(r.defragment(), [3, 3], [1.0, 2.0])


def test_numbers_only_doctest():
    # pyrle/rle.py:980-996
    r = Rle([1, 2, 1, 2, 1], [-np.inf, 1, np.nan, 1, np.inf])
    check(r.numbers_only(), [1, 2, 1, 2, 1],
          [-2147483648.0, 1.0, 0.0, 1.0, 2147483648.0])


def test_shift_doctests():
    # pyrle/rle.py:1020-1060
    r = Rle([3, 2, 1], [1, -1, 2])
    check(r.shift(2, preserve_length=False, fill=np.nan),
          [2, 3, 2, 1], [np.nan, 1.0, -1.0, 2.0])
    check(r.shift(2), [2, 3, 1], [0.0, 1.0, -1.0])
    check(r.shift(-2, fill=np.nan), [1, 2, 1, 2],
          [1.0, -1.0, 2.0, np.nan])
    check(r.shift(-4, preserve_length=False), [1, 1], [-1.0, 2.0])


def test_length_mean_std_doctests():
    # pyrle/rle.py:925-943, 952-955, 1107-1111 — including the
    # reference's idiosyncratic std (square OUTSIDE the sum)
    assert Rle([5], [0]).length == 5
    assert Rle(np.arange(1, 101), [0, 1] * 50).length == 5050
    assert Rle([1, 2, 1], [1, 2, 3]).mean() == 1.5
    assert np.isclose(Rle([1, 2, 1], [1, 2, 3]).std(),
                      0.8660254037844386)


def test_gt_doctest():
    # pyrle/rle.py:372-393: r > r2 and r > scalar
    r = Rle([1, 2, 3], [0, 5, 1])
    r2 = Rle([2, 1, 2], [2, 3, 9])
    check(r > r2, [1, 2, 2, 1], [0.0, 1.0, 0.0, 1.0])
    check(r > 2, [1, 2, 3], [0.0, 1.0, 0.0])


def test_le_doctest():
    # pyrle/rle.py:400-421: r <= r2 and r <= scalar
    r = Rle([1, 2, 3], [0, 5, 1])
    r2 = Rle([2, 1, 2], [2, 3, 9])
    check(r <= r2, [1, 2, 2, 1], [1.0, 0.0, 1.0, 0.0])
    check(r <= 2, [1, 2, 3], [1.0, 0.0, 1.0])


def test_lt_doctest():
    # pyrle/rle.py:440-460: r < r2 and r < scalar
    r = Rle([1, 2, 3], [0, 5, 1])
    r2 = Rle([2, 1, 2], [2, 3, 9])
    check(r < r2, [1, 2, 2, 1], [1.0, 0.0, 1.0, 0.0])
    check(r < 2, [1, 2, 3], [1.0, 0.0, 1.0])


def test_ne_doctest():
    # pyrle/rle.py:502-515: unequal-length operands NaN-extend, and
    # NaN != NaN is False in the reference's subtract-then-threshold
    r = Rle([1, 2, 1], [1, 2, 3])
    r2 = Rle([1, 1, 1], [1, 2, 1])
    check(r != r2, [2, 2], [0.0, 1.0])


def test_truediv_scalar_doctest():
    # pyrle/rle.py:710-730 tail: r1 / 10
    r1 = Rle([1, 2], [0, 1])
    check(r1 / 10, [1, 2], [0.0, 0.1])


def test_repr_roundtrip_class_docstring():
    # pyrle/rle.py:92-113 (class docstring): construction preserves
    # runs/values exactly
    r = Rle([1, 2, 1, 5], [0, 2.1, 3, 4])
    check(r, [1, 2, 1, 5], [0.0, 2.1, 3.0, 4.0])


def test_to_frame_doctest():
    # pyrle/rle.py:1120-1131
    df = Rle([1, 5, 18], [0, 1, 0]).to_frame()
    assert list(df.columns) == ["Runs", "Values"]
    assert df["Runs"].tolist() == [1, 5, 18]
    assert df["Values"].tolist() == [0.0, 1.0, 0.0]
