"""K-mer abundance spectrum + threshold selection (pcon ``Spectrum``).

Reference call sites: src/main.rs:93-110 — ``Spectrum::from_count`` then
``get_threshold`` with one of four rules, surfaced as CLI subcommands
(src/cli.rs:229-241).

The pcon source is not vendored in the reference environment, so the four
rules are [inferred] re-derivations from their names and standard k-mer
spectrum practice; they are documented here and covered by unit tests for
internal consistency.  They only affect automatic threshold *selection* —
correction itself is bit-exact given an abundance (``-a``).

* ``first-minimum`` — the abundance at the first local minimum of the
  spectrum (the dip between the error peak at count 1 and the coverage
  peak); the classic solid/weak cutoff.
* ``rarefaction(p)`` — smallest abundance ``a`` where the rarefaction curve
  flattens: the fraction of distinct k-mers with count exactly ``a`` drops
  below ``p``.
* ``percent-at-least(p)`` — largest abundance ``a`` such that at least a
  fraction ``p`` of all distinct k-mers have count >= a.  (Keeps at least
  p of the mass.)
* ``percent-at-most(p)`` — smallest abundance ``a`` such that at most a
  fraction ``p`` of all distinct k-mers have count >= a.
"""

from __future__ import annotations

import enum

import numpy as np


class ThresholdMethod(enum.Enum):
    FIRST_MINIMUM = "first-minimum"
    RAREFACTION = "rarefaction"
    PERCENT_AT_LEAST = "percent-at-least"
    PERCENT_AT_MOST = "percent-at-most"


class Spectrum:
    """Histogram of k-mer counts (count value -> number of distinct k-mers)."""

    def __init__(self, hist: np.ndarray):
        self.hist = hist.astype(np.int64)

    @classmethod
    def from_count(cls, counts: np.ndarray) -> "Spectrum":
        maxv = int(np.iinfo(counts.dtype).max) if counts.dtype.kind == "u" else int(counts.max(initial=0))
        hist = np.bincount(counts.reshape(-1), minlength=maxv + 1)
        return cls(hist)

    def get_threshold(self, method: ThresholdMethod, percent: float = 0.0):
        """Return the selected abundance, or None when undecidable
        (mirrors the Option<> at src/main.rs:97-108)."""
        h = self.hist
        # Distinct k-mers with non-zero count; index 0 is the unseen space.
        total = int(h[1:].sum())
        if total == 0:
            return None

        if method is ThresholdMethod.FIRST_MINIMUM:
            for a in range(1, len(h) - 1):
                if h[a] < h[a + 1]:
                    return a
            return None

        if method is ThresholdMethod.RAREFACTION:
            for a in range(1, len(h)):
                if h[a] / total < percent:
                    return a
            return None

        if method is ThresholdMethod.PERCENT_AT_LEAST:
            tail = np.cumsum(h[::-1])[::-1]  # tail[a] = #kmers with count >= a
            for a in range(len(h) - 1, 0, -1):
                if tail[a] / total >= percent:
                    return a
            return None

        if method is ThresholdMethod.PERCENT_AT_MOST:
            tail = np.cumsum(h[::-1])[::-1]
            for a in range(1, len(h)):
                if tail[a] / total <= percent:
                    return a
            return None

        raise ValueError(f"unknown method {method}")
