"""Counting layer: canonical k-mer counting + abundance thresholding.

Owns the capabilities br imports from the un-vendored ``pcon`` crate
(reference call sites: src/main.rs:60-115).  Dense saturating-u8 counts over
the canonical half-space (index = canonical >> 1, 2^(2k-1) entries), a
k-mer abundance spectrum, four threshold-selection rules, and thresholding
into a :class:`br_tpu.set.solid.SolidSet` (solid iff count > abundance —
verified bit-exactly against the reference asset).
"""

from br_tpu.count.counter import Counter, count_file  # noqa: F401
from br_tpu.count.spectrum import Spectrum, ThresholdMethod  # noqa: F401
