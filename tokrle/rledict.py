"""`RleDict` — pyrle-parity keyed collection of Rles.

API parity with the reference's ``pyrle.RleDict`` (pyrle/rledict.py:37-131)
for in-memory use; the distributed equivalent is the keyed RLE-table
Dataset in :mod:`tokrle.pipelines.rle_table` (same kernels, Ray Data
execution).  Keys are chromosome-like strings or (key, strand) tuples.
"""

from __future__ import annotations

from numbers import Number

import numpy as np
import pandas as pd

from tokrle.kernels import rle as K
from tokrle.rle import Rle

__all__ = ["RleDict"]


def _maybe_pyranges(df: pd.DataFrame):
    """Wrap an interval DataFrame into a PyRanges when the package exists
    (ref pyrle/rle.py:330-335 returns PyRanges with a DataFrame fallback);
    plain DataFrame otherwise — same columns either way."""
    try:
        import pyranges as pr

        return pr.PyRanges(df)
    except Exception:
        return df


def _natsorted(keys):
    import re

    def keyfn(k):
        s = k if isinstance(k, str) else k[0]
        parts = re.split(r"(\d+)", s)
        return ([(int(p) if p.isdigit() else p) for p in parts if p != ""],
                "" if isinstance(k, str) else k[1])

    return sorted(keys, key=lambda k: tuple(
        (0, x) if isinstance(x, int) else (1, x)
        for part in keyfn(k) for x in (part if isinstance(part, list) else [part])))


class RleDict:
    """Keyed collection of run-length vectors (ref pyrle/rledict.py:37-131).

    Build from a dict of Rles, or an interval DataFrame with columns
    ``Chromosome, Start, End[, Strand]`` (coverage construction, ref
    pyrle/rledict.py:133-180)."""

    def __init__(self, data=None, stranded: bool = False,
                 value_col: str | None = None):
        self.rles: dict = {}
        if data is None:
            return
        if hasattr(data, "df") and not isinstance(data, (dict, pd.DataFrame)):
            # PyRanges-shaped input (ref pyrle/rledict.py:148-151 accepts
            # PyRanges): duck-typed on .df so the shim works without the
            # pyranges package (not in this container)
            data = data.df
        if isinstance(data, dict):
            self.rles = {k: (v if isinstance(v, Rle) else Rle(*v))
                         for k, v in data.items()}
        elif isinstance(data, pd.DataFrame):
            keys = ["Chromosome", "Strand"] if stranded else ["Chromosome"]
            for key, sub in data.groupby(keys, sort=False):
                key = key if stranded else (
                    key[0] if isinstance(key, tuple) else key)
                weights = (sub[value_col].to_numpy(dtype=np.float64)
                           if value_col else None)
                runs, values = K.coverage(
                    sub.Start.to_numpy(dtype=np.int64),
                    sub.End.to_numpy(dtype=np.int64), weights)
                rle = Rle.__new__(Rle)
                rle.runs, rle.values = runs, values
                self.rles[key] = rle
        else:
            raise TypeError(f"cannot build RleDict from {type(data)}")

    # -- mapping protocol ---------------------------------------------------
    def keys(self):
        return _natsorted(self.rles.keys())

    def values(self):
        return [self.rles[k] for k in self.keys()]

    def items(self):
        return [(k, self.rles[k]) for k in self.keys()]

    def __len__(self) -> int:
        return len(self.rles)

    def __iter__(self):
        return iter(self.items())

    def __getitem__(self, key):
        if hasattr(key, "df") and not isinstance(key, (str, tuple,
                                                       pd.DataFrame)):
            # PyRanges-shaped query (ref pyrle/rledict.py:256-294); result
            # is the interval DataFrame (wrapped back into PyRanges by
            # _maybe_pyranges when the package is available)
            return _maybe_pyranges(self[key.df])
        if isinstance(key, pd.DataFrame):
            # batched range lookup per key ("range join"), concat with key
            # columns re-attached (ref pyrle/rledict.py:228-302 +
            # pyrle/src/getitem.pyx:201-325)
            frames = []
            for chrom, sub in key.groupby("Chromosome", sort=False):
                targets = ([k for k in self.rles
                            if isinstance(k, tuple) and k[0] == chrom]
                           if self.stranded else
                           ([chrom] if chrom in self.rles else []))
                for t in targets:
                    r = self.rles[t]
                    ids, qs, qe, runs, vals = K.rle_getitems(
                        r.runs, r.values,
                        sub.Start.to_numpy(dtype=np.int64),
                        sub.End.to_numpy(dtype=np.int64))
                    df = pd.DataFrame({"Chromosome": chrom, "Start": qs,
                                       "End": qe, "ID": ids, "Run": runs,
                                       "Value": vals})
                    if isinstance(t, tuple):
                        df["Strand"] = t[1]
                    frames.append(df)
            return (pd.concat(frames, ignore_index=True) if frames
                    else pd.DataFrame(columns=["Chromosome", "Start", "End",
                                               "ID", "Run", "Value"]))
        if isinstance(key, (str, tuple)) and key in self.rles:
            return self.rles[key]
        if isinstance(key, str):
            # unstranded lookup against stranded dict: sub-dict of strands
            sub = {k: v for k, v in self.rles.items()
                   if isinstance(k, tuple) and k[0] == key}
            if sub:
                return RleDict(sub)
        raise KeyError(key)

    def __setitem__(self, key, value):
        self.rles[key] = value

    @property
    def stranded(self) -> bool:
        """ref pyrle/rledict.py:698-703."""
        return any(isinstance(k, tuple) for k in self.rles)

    # -- binary ops (ref pyrle/methods.py:80-120) ---------------------------
    def _binary(self, other, op_name: str):
        ops = {"add": lambda a, b: a + b, "sub": lambda a, b: a - b,
               "mul": lambda a, b: a * b, "div": lambda a, b: a / b}
        op = ops[op_name]
        if isinstance(other, Number):
            return RleDict({k: op(v, other) for k, v in self.rles.items()})
        a, b = self, other
        if a.stranded != b.stranded:
            # strand harmonization: collapse strands by adding them
            # (ref pyrle/methods.py:43-65)
            a = a.unstrand()
            b = b.unstrand()
        out = {}
        keys_a = set(a.rles)
        keys_b = set(b.rles)
        for k in keys_a & keys_b:
            out[k] = op(a.rles[k], b.rles[k])
        for k in keys_a - keys_b:
            zero = Rle(np.array([a.rles[k].length or 1]), np.array([0.0]))
            out[k] = op(a.rles[k], zero)
        for k in keys_b - keys_a:
            zero = Rle(np.array([b.rles[k].length or 1]), np.array([0.0]))
            out[k] = op(zero, b.rles[k])
        return RleDict(out)

    def unstrand(self):
        """Collapse (key, strand) -> key by adding strand Rles
        (ref pyrle/methods.py:43-65)."""
        if not self.stranded:
            return self
        out: dict = {}
        for k, v in self.rles.items():
            base = k[0] if isinstance(k, tuple) else k
            out[base] = (out[base] + v) if base in out else v
        return RleDict(out)

    def __add__(self, other):
        return self._binary(other, "add")

    def __radd__(self, other):
        return self._binary(other, "add")

    def __sub__(self, other):
        return self._binary(other, "sub")

    def __mul__(self, other):
        return self._binary(other, "mul")

    def __rmul__(self, other):
        return self._binary(other, "mul")

    def __truediv__(self, other):
        return self._binary(other, "div")

    def __rsub__(self, other):
        """scalar - rledict, per key (ref pyrle/rledict.py:320-322)."""
        if isinstance(other, Number):
            return RleDict({k: other - v for k, v in self.rles.items()})
        return NotImplemented

    def __rtruediv__(self, other):
        """scalar / rledict, per key (ref pyrle/rledict.py:323-327)."""
        if isinstance(other, Number):
            return RleDict({k: other / v for k, v in self.rles.items()})
        return NotImplemented

    add = __add__
    sub = __sub__
    mul = __mul__
    div = __truediv__

    def __eq__(self, other) -> bool:  # type: ignore[override]
        """Structural equality — the reference test-suite's oracle
        (ref pyrle/rledict.py:188-198)."""
        if not isinstance(other, RleDict):
            return NotImplemented
        if set(self.rles) != set(other.rles):
            return False
        return all(self.rles[k].equal(other.rles[k]) for k in self.rles)

    def __hash__(self):
        return id(self)

    # -- unary / UDF (ref pyrle/rledict.py:418-689) -------------------------
    def _per_key(self, fn):
        return RleDict({k: fn(v) for k, v in self.rles.items()})

    def apply(self, f, defragment: bool = True, **kwargs):
        return self._per_key(lambda r: r.apply(f, defragment, **kwargs))

    def apply_values(self, f, defragment: bool = True, **kwargs):
        return self._per_key(lambda r: r.apply_values(f, defragment, **kwargs))

    def apply_runs(self, f, defragment: bool = True, **kwargs):
        return self._per_key(lambda r: r.apply_runs(f, defragment, **kwargs))

    def shift(self, dist: int = 1, **kwargs):
        return self._per_key(lambda r: r.shift(dist, **kwargs))

    def defragment(self, numbers_only: bool = False):
        return self._per_key(lambda r: r.defragment(numbers_only))

    def numbers_only(self, **kwargs):
        return self._per_key(lambda r: r.numbers_only(**kwargs))

    def copy(self):
        return self._per_key(lambda r: r.copy())

    def add_pseudocounts(self, pseudo: float = 0.01):
        """Replace zero values with ``pseudo`` (the reference's version has
        a latent AttributeError — ndarray.loc, ref pyrle/rledict.py:418-420;
        implemented correctly here, divergence documented)."""
        def fix(r: Rle) -> Rle:
            v = r.values.copy()
            v[v == 0] = pseudo
            return Rle(r.runs.copy(), v)
        return self._per_key(fix)

    def make_strands_same_length(self, fill_value: float = 0.0):
        """Pad the shorter strand per chromosome (ref pyrle/rledict.py:650-676)."""
        if not self.stranded:
            return self
        out = dict(self.rles)
        bases = {k[0] for k in self.rles if isinstance(k, tuple)}
        for base in bases:
            plus = out.get((base, "+"))
            minus = out.get((base, "-"))
            if plus is None or minus is None:
                continue
            diff = plus.length - minus.length
            if diff > 0:
                minus = Rle(np.append(minus.runs, diff),
                            np.append(minus.values, fill_value))
                out[(base, "-")] = minus
            elif diff < 0:
                plus = Rle(np.append(plus.runs, -diff),
                           np.append(plus.values, fill_value))
                out[(base, "+")] = plus
        return RleDict(out)

    # -- io / decode (ref pyrle/rledict.py:708-758) -------------------------
    def to_ranges(self):
        """Decode to interval rows (Chromosome, Start, End, Score[, Strand]);
        rows with Score == 0 are dropped (ref pyrle/methods.py:159-213).
        Returns a PyRanges when the package is importable, else the same
        data as a plain DataFrame (ref pyrle/rledict.py:708-742)."""
        frames = []
        for k in self.keys():
            r = self.rles[k]
            ends = np.cumsum(r.runs)
            starts = np.concatenate(([0], ends[:-1]))
            keep = r.values != 0
            df = pd.DataFrame({
                "Chromosome": k[0] if isinstance(k, tuple) else k,
                "Start": starts[keep],
                "End": ends[keep],
                "Score": r.values[keep],
            })
            if isinstance(k, tuple):
                df["Strand"] = k[1]
            frames.append(df)
        if not frames:
            return _maybe_pyranges(pd.DataFrame(
                columns=["Chromosome", "Start", "End", "Score"]))
        return _maybe_pyranges(pd.concat(frames, ignore_index=True))

    def to_table(self) -> pd.DataFrame:
        """Concat per-key (Runs, Values) frames with key columns prepended
        (ref pyrle/rledict.py:744-758)."""
        frames = []
        for k in self.keys():
            df = self.rles[k].to_frame()
            if isinstance(k, tuple):
                df.insert(0, "Strand", k[1])
                df.insert(0, "Chromosome", k[0])
            else:
                df.insert(0, "Chromosome", k)
            frames.append(df)
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(columns=["Chromosome", "Runs", "Values"])

    def to_csv(self, path, sep: str = "\t"):
        self.to_table().to_csv(path, sep=sep, index=False)

    def __repr__(self) -> str:
        keys = self.keys()
        return f"RleDict({len(keys)} keys: {keys[:5]}{'...' if len(keys) > 5 else ''})"


def from_csv(path, sep: str = "\t") -> RleDict:
    """Read (Chromosome[,Strand],Runs,Values) CSV -> RleDict
    (ref pyrle/__init__.py:13-29)."""
    df = pd.read_csv(path, sep=sep)
    stranded = "Strand" in df.columns
    keys = ["Chromosome", "Strand"] if stranded else ["Chromosome"]
    out = {}
    for key, sub in df.groupby(keys, sort=False):
        key = key if stranded else (key[0] if isinstance(key, tuple) else key)
        out[key] = Rle(sub.Runs.to_numpy(), sub.Values.to_numpy())
    return RleDict(out)
