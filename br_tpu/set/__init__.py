"""Membership layer: the solid-k-mer set (reference ``src/set.rs``).

The reference contract is ``KmerSet { get(kmer: u64) -> bool, k() -> u8 }``
(src/set.rs:17-21).  ``get`` accepts *forward* (non-canonical) k-mers;
canonicalization happens inside (proved by the reference ``forward`` tests,
src/set/pcon.rs:219-230 and src/set/hash.rs:207-219).

Two backends, mirroring the reference:

* :class:`br_tpu.set.solid.SolidSet` — dense 2^(2k-1)-bit bitfield over the
  canonical half-space (the pcon ``Solid``); feasible up to k≈17 (1 GiB).
* :class:`br_tpu.set.hash.HashSet` — sparse set for large k up to 31
  (the FxHashSet backend); on device it is a sorted-array membership probe.

Both expose the same dual interface:

* scalar ``get(kmer) / k`` for the oracle implementation, and
* ``device_probe_tables()`` returning jax arrays + a probe closure for the
  batched TPU engine.
"""

from __future__ import annotations

from typing import Protocol


class KmerSet(Protocol):
    """Uniform membership interface (reference src/set.rs:17-21)."""

    def get(self, kmer: int) -> bool:  # pragma: no cover - protocol
        ...

    @property
    def k(self) -> int:  # pragma: no cover - protocol
        ...


from br_tpu.set.solid import SolidSet  # noqa: E402,F401
from br_tpu.set.hash import HashSet  # noqa: E402,F401
