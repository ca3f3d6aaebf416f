"""`Rle` — pyrle-parity run-length vector over the vectorized kernels.

API parity with the reference's ``pyrle.Rle`` (pyrle/rle.py:67-1161), with
every Cython inner loop replaced by the vectorized NumPy kernels in
:mod:`tokrle.kernels.rle`.  This is the *semantics* layer: runs int64,
values float64, approximate (1e-5) coalescing — exactly the reference's
domain.  The scale path (Ray Data pipelines over token tables) lives in
:mod:`tokrle.pipelines` and uses the same kernels per batch/group.
"""

from __future__ import annotations

from numbers import Number

import numpy as np
import pandas as pd

from tokrle.kernels import rle as K

__all__ = ["Rle"]


class Rle:
    """Run-length encoded float64 vector (reference: pyrle/rle.py:67-167).

    Construct from ``(runs, values)`` (canonicalized: zero runs dropped,
    adjacent ~equal values coalesced), from a plain dense vector (RLE
    encode), or empty.
    """

    __array_priority__ = 100  # so np_array * rle dispatches to our methods

    def __init__(self, runs=None, values=None):
        if runs is not None and values is not None:
            runs = np.asarray(runs, dtype=np.int64)
            values = np.asarray(values, dtype=np.float64)
            assert len(runs) == len(values)
            self.runs, self.values = K.canonicalize(runs, values)
        elif runs is not None:
            r, v = K.rle_encode(np.asarray(runs))
            self.runs = r
            self.values = v.astype(np.float64)
        else:
            self.runs = np.empty(0, dtype=np.int64)
            self.values = np.empty(0, dtype=np.float64)

    # -- properties ---------------------------------------------------------
    @property
    def length(self) -> int:
        """Logical (decoded) length: sum of runs (ref pyrle/rle.py:917-943)."""
        return int(np.sum(self.runs))

    def __len__(self) -> int:
        """Number of runs (ref pyrle/rle.py:429-436)."""
        return len(self.runs)

    def to_array(self) -> np.ndarray:
        return K.rle_decode(self.runs, self.values)

    # -- arithmetic ---------------------------------------------------------
    def _binary(self, other, kernel, scalar_op):
        if isinstance(other, Number):
            return Rle(self.runs, scalar_op(self.values, other))
        r, v = kernel(self.runs, self.values, other.runs, other.values)
        out = Rle.__new__(Rle)
        out.runs, out.values = r, v
        return out

    def __add__(self, other):
        return self._binary(other, K.rle_add, np.add)

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self._binary(other, K.rle_sub, np.subtract)

    def __rsub__(self, other):
        if isinstance(other, Number):
            return Rle(self.runs, other - self.values)
        return NotImplemented

    def __mul__(self, other):
        return self._binary(other, K.rle_mul, np.multiply)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        if isinstance(other, Number):
            with np.errstate(divide="ignore", invalid="ignore"):
                return Rle(self.runs, self.values / other)
        return self._binary(other, K.rle_div, None)

    def __rtruediv__(self, other):
        if isinstance(other, Number):
            with np.errstate(divide="ignore", invalid="ignore"):
                return Rle(self.runs, other / self.values)
        return NotImplemented

    def __neg__(self):
        out = Rle.__new__(Rle)
        out.runs, out.values = self.runs.copy(), -self.values
        return out

    # -- comparisons (ref pyrle/rle.py:248-276, 342-466, 502-522) -----------
    def _compare(self, other, cmp):
        if isinstance(other, Number):
            other = Rle(np.array([self.length]), np.array([float(other)]))
        r, v = K.rle_compare(self.runs, self.values, other.runs, other.values, cmp)
        out = Rle.__new__(Rle)
        out.runs, out.values = r, v
        return out

    def __eq__(self, other):  # type: ignore[override]
        return self._compare(other, "eq")

    def __ne__(self, other):  # type: ignore[override]
        return self._compare(other, "ne")

    def __ge__(self, other):
        return self._compare(other, "ge")

    def __gt__(self, other):
        return self._compare(other, "gt")

    def __le__(self, other):
        return self._compare(other, "le")

    def __lt__(self, other):
        return self._compare(other, "lt")

    def equal(self, other) -> bool:
        """Structural equality (the reference test-suite's oracle,
        ref pyrle/rledict.py:188-198)."""
        return (
            np.array_equal(self.runs, other.runs)
            and np.allclose(self.values, other.values, equal_nan=True)
        )

    # -- numpy ufunc hook (ref pyrle/rle.py:203-246) ------------------------
    def __array_ufunc__(self, ufunc, method, *args, **kwargs):
        self = self.copy()
        func = getattr(ufunc, method)
        rest = [a for a in args if not isinstance(a, Rle)]
        self.values = func(self.values, *rest, **kwargs)
        return self

    # -- UDF hooks (ref pyrle/rle.py:747-872) -------------------------------
    def apply_values(self, f, defragment: bool = True, **kwargs):
        values = np.asarray(f(self.values.copy(), **kwargs), dtype=np.float64)
        out = Rle(self.runs.copy(), values) if defragment else Rle.__new__(Rle)
        if not defragment:
            out.runs, out.values = self.runs.copy(), values
        return out

    def apply_runs(self, f, defragment: bool = True, **kwargs):
        runs = np.asarray(f(self.runs.copy(), **kwargs), dtype=np.int64)
        out = Rle(runs, self.values.copy()) if defragment else Rle.__new__(Rle)
        if not defragment:
            out.runs, out.values = runs, self.values.copy()
        return out

    def apply(self, f, defragment: bool = True, **kwargs):
        out = f(self.copy(), **kwargs)
        if defragment:
            out = Rle(out.runs, out.values)
        return out

    # -- unary helpers ------------------------------------------------------
    def numbers_only(self, nan: float = 0.0, posinf: float = 2147483647,
                     neginf: float = -2147483648):
        """np.nan_to_num on values + defragment (ref pyrle/rle.py:961-998)."""
        values = np.nan_to_num(self.values, nan=nan, posinf=posinf, neginf=neginf)
        return Rle(self.runs.copy(), values).defragment()

    def defragment(self, numbers_only: bool = False):
        """Coalesce + normalize -0.0 -> 0.0 (ref pyrle/rle.py:879-915)."""
        rle = self.numbers_only() if numbers_only else self
        r, v = K.defragment(rle.runs, rle.values)
        out = Rle.__new__(Rle)
        out.runs, out.values = r, v
        return out

    def shift(self, dist: int = 1, preserve_length: bool = True, fill: float = 0.0):
        """Shift logical vector (ref pyrle/rle.py:1000-1095)."""
        r, v = K.rle_shift(self.runs, self.values, dist, preserve_length, fill)
        out = Rle.__new__(Rle)
        out.runs, out.values = r, v
        return out

    def copy(self):
        out = Rle.__new__(Rle)
        out.runs, out.values = self.runs.copy(), self.values.copy()
        return out

    # -- aggregations (reproduce the reference's exact formulas) ------------
    def mean(self) -> float:
        """sum(values)/sum(runs) — the reference's (idiosyncratic, not
        length-weighted) formula (ref pyrle/rle.py:945-959)."""
        return float(np.sum(self.values) / np.sum(self.runs))

    def std(self) -> float:
        """sqrt((sum(values - mean))^2 / (length - 1)) — square *outside*
        the sum, reproduced exactly (ref pyrle/rle.py:1097-1113)."""
        mean = self.mean()
        return float(np.sqrt(np.sum(self.values - mean) ** 2 / (self.length - 1)))

    # -- random access (ref pyrle/rle.py:278-340) ---------------------------
    def getlocs(self, locs) -> np.ndarray:
        """Values at the given positions of the logical vector.  Positions
        are sorted first, exactly like the reference's list dispatch
        (ref pyrle/rle.py:337-340: ``np.sort`` then ``getlocs``)."""
        locs = np.sort(np.asarray(locs, dtype=np.int64))
        return K.rle_getlocs(self.runs, self.values, locs)

    def __getitem__(self, key):
        if isinstance(key, (list, np.ndarray)) and not isinstance(key, str):
            # list of positions -> values (ref pyrle/rle.py:336-340)
            return self.getlocs(key)
        if isinstance(key, int):
            return float(K.rle_getlocs(self.runs, self.values, np.array([key]))[0])
        if isinstance(key, slice):
            start = key.start or 0
            end = key.stop if key.stop is not None else self.length
            r, v = K.rle_slice(self.runs, self.values, start, end)
            out = Rle.__new__(Rle)
            out.runs, out.values = r, v
            return out
        if isinstance(key, pd.DataFrame):
            ids, starts, ends, runs, vals = K.rle_getitems(
                self.runs, self.values, key.Start.values, key.End.values)
            return pd.DataFrame({
                "Start": starts, "End": ends, "ID": ids,
                "Run": runs, "Value": vals,
            })
        if hasattr(key, "df"):
            # PyRanges-shaped query (ref pyrle/rle.py:300-335): key columns
            # from the query frame re-attached; wrapped back into PyRanges
            # when the package is importable, else the same DataFrame
            qdf = key.df
            if qdf.empty:
                return pd.DataFrame(
                    columns="Chromosome Start End ID Run Value".split())
            ids, starts, ends, runs, vals = K.rle_getitems(
                self.runs, self.values,
                qdf.Start.to_numpy(dtype=np.int64),
                qdf.End.to_numpy(dtype=np.int64))
            df = pd.DataFrame({
                "Chromosome": qdf.Chromosome.iloc[0],
                "Start": starts, "End": ends, "ID": ids,
                "Run": runs, "Value": vals,
            })
            if "Strand" in qdf:
                df.insert(3, "Strand", qdf.Strand.iloc[0])
            from tokrle.rledict import _maybe_pyranges

            return _maybe_pyranges(df)
        raise IndexError(f"unsupported key type {type(key)}")

    # -- io -----------------------------------------------------------------
    def to_frame(self) -> pd.DataFrame:
        """(Runs, Values) frame (ref pyrle/rle.py:1115-1161)."""
        return pd.DataFrame({"Runs": self.runs, "Values": self.values})

    def to_csv(self, path, sep: str = ","):
        self.to_frame().to_csv(path, sep=sep, index=False)

    def __repr__(self) -> str:
        n = len(self.runs)
        avg = self.length / n if n else 0.0
        head = ", ".join(
            f"{r}x{v:g}" for r, v in zip(self.runs[:8], self.values[:8]))
        more = " ..." if n > 8 else ""
        return (f"Rle(length={self.length}, nruns={n}, avg_run={avg:.2f}, "
                f"[{head}{more}])")

    def __hash__(self):
        return id(self)
