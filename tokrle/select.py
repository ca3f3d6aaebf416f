"""Per-chunk value-distribution profiling and codec auto-selection.

Generalizes the reference's single hard-coded representation (runs+values,
ref pyrle/rle.py:146-147) into a codec *choice*: profile each chunk
(cardinality, run-length histogram, bit-width, byte-pair compressibility),
estimate every codec's encoded size analytically, and pick the smallest.
The chosen codec and the profile are recorded as lineage next to the
encoded payload (see tokrle.stages.encoder).

Estimates are exact for plain/bitpack/for and near-exact for dict/rle
(they ignore only fixed ~14-byte headers); fsst is estimated from a word
sample.  Selection is therefore deterministic and costs O(n) per chunk.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tokrle.codecs._bits import bit_width
from tokrle.codecs.core import FsstLite, encode

_SAMPLE = 1 << 16


@dataclass
class ChunkProfile:
    n: int
    itemsize: int
    vmin: int
    vmax: int
    n_runs: int
    max_run: int
    cardinality: int          # exact when cheap, else sample lower bound
    cardinality_exact: bool
    fsst_hit_ratio: float     # estimated fraction of 16-bit words covered by table

    @property
    def raw_bytes(self) -> int:
        return self.n * self.itemsize


def profile_chunk(x: np.ndarray) -> ChunkProfile:
    n = len(x)
    if n == 0:
        return ChunkProfile(0, x.dtype.itemsize, 0, 0, 0, 0, 0, True, 0.0)
    vmin = int(x.min())
    vmax = int(x.max())
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(x[:-1], x[1:], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    run_lengths = np.diff(starts, append=n)
    n_runs = len(starts)
    max_run = int(run_lengths.max())
    # cardinality: O(n) bincount when the value span is small, else sample
    span = vmax - vmin
    if span < (1 << 20):
        card = int(np.count_nonzero(np.bincount((x - vmin).astype(np.int64),
                                                minlength=span + 1)))
        card_exact = True
    else:
        sample = x[:: max(1, n // _SAMPLE)]
        card = len(np.unique(sample))
        card_exact = False
    # fsst: estimated top-254 16-bit-word coverage from a sample
    raw = np.frombuffer(x.tobytes(), dtype=np.uint8)
    if len(raw) % 2:
        raw = raw[:-1]
    words = raw.view(np.uint16)
    ws = words[:: max(1, len(words) // _SAMPLE)]
    if len(ws):
        _, counts = np.unique(ws, return_counts=True)
        top = np.sort(counts)[::-1][: FsstLite.MAX_SYMBOLS]
        hit_ratio = float(top.sum() / len(ws))
    else:
        hit_ratio = 0.0
    return ChunkProfile(n, x.dtype.itemsize, vmin, vmax, n_runs, max_run,
                        card, card_exact, hit_ratio)


def estimate_sizes(p: ChunkProfile) -> dict[str, float]:
    """Estimated payload bytes per codec for a profiled chunk."""
    if p.n == 0:
        return {"plain": 0.0}
    est: dict[str, float] = {}
    est["plain"] = float(p.raw_bytes)
    span_w = bit_width(p.vmax - p.vmin)
    if p.vmin >= 0:
        est["bitpack"] = 1 + p.n * bit_width(p.vmax) / 8
    est["for"] = 9 + p.n * span_w / 8
    code_w = bit_width(max(p.cardinality - 1, 0))
    est["dict"] = 18 + p.cardinality * span_w / 8 + p.n * code_w / 8
    run_w = bit_width(max(p.max_run - 1, 0))
    est["rle"] = 14 + p.n_runs * (run_w + span_w) / 8
    nwords = p.raw_bytes // 2
    est["fsst"] = (10 + 2 * FsstLite.MAX_SYMBOLS + nwords / 8
                   + nwords * (p.fsst_hit_ratio + 2 * (1 - p.fsst_hit_ratio)))
    return est


def select_codec(p: ChunkProfile) -> str:
    est = estimate_sizes(p)
    return min(est, key=est.__getitem__)


def auto_encode(x: np.ndarray) -> tuple[str, bytes, ChunkProfile]:
    """Profile -> select -> encode; returns (codec, payload, profile)."""
    p = profile_chunk(x)
    codec = select_codec(p)
    payload = encode(codec, x)
    # the analytic estimate can rarely lose to plain on adversarial input;
    # never ship a payload larger than raw
    if len(payload) >= p.raw_bytes and codec != "plain":
        codec = "plain"
        payload = encode("plain", x)
    return codec, payload, p
