"""PII / sensitive-term redaction: vectorized regex scrubbing of a text
column with per-source match accounting.

Everything stays in Arrow RE2 kernels (``count_substring_regex`` /
``replace_substring_regex``) — no Python-level row loop, no shuffle: a
redaction pass is embarrassingly parallel, the only aggregate is the
per-source stats combine.  Patterns are RE2 syntax (no backreferences),
which DuckDB's regexp functions share, so a stats query has an EXACT
SQL oracle including the byte length of the rewritten text.

``DEFAULT_PATTERNS`` covers the standard PII trio (email, phone-like,
IPv4); any dict of named RE2 patterns works — e.g. a custom
sensitive-term list for contractual scrubbing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.functions.dedup import auto_concurrency as _auto

DEFAULT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ().\-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


class Redactor:
    """Stateful stage: patterns validated/ordered once per actor; each
    batch is scrubbed with one RE2 kernel pass per pattern."""

    def __init__(self, patterns: dict[str, str] | None = None, *,
                 replacement: str = "[REDACTED]",
                 text_col: str = "text",
                 count_matches: bool = True) -> None:
        import pyarrow.compute as pc

        self.patterns = dict(patterns or DEFAULT_PATTERNS)
        self.replacement = replacement
        self.text_col = text_col
        self.count_matches = count_matches
        # fail fast on bad patterns (RE2 compile happens inside the
        # kernel; probe once per actor, not once per batch)
        probe = pa.array(["x"], type=pa.string())
        for name, pat in self.patterns.items():
            try:
                pc.count_substring_regex(probe, pat)
            except pa.ArrowInvalid as exc:
                raise ValueError(
                    f"redact: pattern {name!r} is not valid RE2: {exc}"
                ) from exc

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column(self.text_col)
        text = text.combine_chunks() if isinstance(
            text, pa.ChunkedArray) else text
        total = np.zeros(len(batch), dtype=np.int64)
        for pat in self.patterns.values():
            if self.count_matches:
                total += pc.count_substring_regex(text, pat).to_numpy(
                    zero_copy_only=False).astype(np.int64)
            text = pc.replace_substring_regex(text, pat, self.replacement)
        i = batch.column_names.index(self.text_col)
        out = batch.set_column(i, self.text_col, text)
        if self.count_matches:
            out = out.append_column(
                "n_redactions", pa.array(total, type=pa.int64()))
        return out


def redact(ds, patterns: dict[str, str] | None = None, *,
           replacement: str = "[REDACTED]", text_col: str = "text",
           count_matches: bool = True, concurrency=None):
    """Scrub ``text_col`` in place; with ``count_matches`` a per-row
    ``n_redactions`` column is appended (sum over all patterns)."""
    return ds.map_batches(
        Redactor,
        fn_constructor_kwargs={"patterns": patterns,
                               "replacement": replacement,
                               "text_col": text_col,
                               "count_matches": count_matches},
        batch_format="pyarrow", concurrency=concurrency or _auto())


def redaction_source_stats(ds, patterns: dict[str, str], *,
                           replacement: str = "[REDACTED]",
                           text_col: str = "text",
                           source_col: str = "source"):
    """Per-source scrub accounting: docs, docs touched, total matches,
    and the byte length of the REWRITTEN text (proves the rewrite
    itself, not just the counts, matches the oracle)."""
    import pyarrow.compute as pc

    from tokrle.functions.fold import source_sums

    scrubbed = redact(ds, patterns, replacement=replacement,
                      text_col=text_col, count_matches=True)

    def per_doc(batch: pa.Table) -> pa.Table:
        n = batch.column("n_redactions")
        return pa.table({
            source_col: batch.column(source_col),
            "n_matches": n,
            "docs_redacted": pc.cast(pc.greater(n, 0), pa.int64()),
            "bytes_after": pc.cast(
                pc.binary_length(batch.column(text_col)), pa.int64()),
        })

    # source cardinality is tiny: map-side partial shrink + driver fold
    # (tokrle.functions.fold) replaces the aggregator-pool exchange
    df = source_sums(scrubbed.map_batches(per_doc, batch_format="pyarrow"),
                     source_col,
                     ["docs_redacted", "n_matches", "bytes_after"],
                     count_alias="n_docs")
    return df[[source_col, "n_docs", "docs_redacted", "n_matches",
               "bytes_after"]]
