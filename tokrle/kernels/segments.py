"""Ragged-segment reductions over flat arrays (pure NumPy).

``segment_sums`` is the one safe way this codebase reduces a flat value
buffer at ragged row boundaries.  The earlier idiom —
``np.add.reduceat(v, np.minimum(offsets[:-1], len(v) - 1))`` — silently
miscounts when a batch ends with empty segments (the clamp moves the empty
segment's start *inside* the previous segment, so the previous segment's
sum is truncated) and raises IndexError when the final offset equals
``len(v)``.  The cumulative-sum difference has neither failure mode and is
the same O(n) single pass.
"""

from __future__ import annotations

import numpy as np


def segment_sums(values: np.ndarray, offsets: np.ndarray,
                 dtype=None) -> np.ndarray:
    """Per-segment sums of ``values`` at boundaries ``offsets``
    (len n_segments+1, offsets[0] == 0, offsets[-1] == len(values)).

    Empty segments anywhere (including trailing) yield exactly 0.  For
    unsigned dtypes the sums wrap mod 2**dtype_bits, consistently with any
    other segmentation of the same data — callers relying on modular
    hashes (fingerprints, checksums) get batching-invariant results.
    """
    offsets = np.asarray(offsets)
    out_dtype = dtype or values.dtype
    c = np.zeros(len(values) + 1, dtype=out_dtype)
    np.cumsum(values, dtype=out_dtype, out=c[1:])
    return c[offsets[1:]] - c[offsets[:-1]]
