"""br_tpu — a TPU-native long-read k-mer correction engine.

A from-scratch re-design of the capabilities of ``natir/br`` ("Brutal
Rewrite", reference at /root/reference) for TPU hardware:

* the solid-k-mer membership set is a 2-bit-packed canonical-k-mer bitfield
  resident in HBM (``br_tpu.set.solid``),
* per-read scan-and-fix correction strategies (One, Two, Graph, Greedy,
  GapSize; reference ``src/correct/``) run as vectorized, vmapped
  ``lax.while_loop`` state machines over padded read batches
  (``br_tpu.correct.engine``), with an exact scalar oracle in
  ``br_tpu.correct.reference``,
* k-mer counting + abundance thresholding (reference's pcon dependency)
  is a device scatter-add histogram (``br_tpu.count``),
* multi-chip/multi-host scaling is data-parallel read sharding over a
  ``jax.sharding.Mesh`` with a replicated bitfield (``br_tpu.parallel``).

Encoding facts (verified bit-exactly against the reference test asset
``tests/data/raw.k11.a2.solid``, see tests/test_codec.py):

* nucleotide code = ``(ascii >> 1) & 0b11`` => A=0, C=1, T=2, G=3,
* complement = code XOR 0b10, canonical k-mer = the variant (forward or
  reverse-complement) with even popcount (requires odd k),
* solid bitfield index = ``canonical >> 1`` in a ``2**(2k-1)``-bit space,
  LSB-first within bytes,
* a k-mer is solid iff ``count > abundance`` (strictly greater),
* solid file format = gzip(k: u8 || bitfield bytes).
"""

__version__ = "0.1.0"

from br_tpu import codec  # noqa: F401

DEFAULT_CONFIRM = 5  # reference src/cli.rs:135-137
DEFAULT_MAX_SEARCH = 7  # reference src/cli.rs:140-142
DEFAULT_RECORD_BUFFER = 8192  # reference src/cli.rs:144-147
DEFAULT_CORRECTIONS = ("one", "two", "graph", "greedy", "gap-size")  # src/cli.rs:121-132
