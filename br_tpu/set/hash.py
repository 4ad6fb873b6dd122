"""Sparse membership set for large k (the FxHashSet backend equivalent).

Reference: ``src/set/hash.rs`` — a hash set of canonical u64 k-mers for k up
to 31 where the dense bitfield (2^(2k-1) bits) is infeasible.  Only set
semantics matter (no iteration-order dependence, src/set/hash.rs note in
SURVEY §2.2).

TPU-native design: the host builds a python set; ``device_table()`` freezes
it into a *sorted* uint64 array.  On device, membership is a branch-free
binary search (``jnp.searchsorted`` over the sorted table + equality check),
which XLA lowers to ~log2(n) gathers — the idiomatic dense-probe analog of a
hash lookup on hardware without scatter-friendly caches.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from br_tpu import codec


class HashSet:
    """Sparse canonical k-mer membership set for k up to 31."""

    def __init__(self, k: int, kmers: set[int] | None = None):
        if not (1 <= k <= codec.MAX_K):
            raise ValueError(f"k must be in [1, {codec.MAX_K}], got {k}")
        self._k = k
        self._set: set[int] = kmers if kmers is not None else set()

    @property
    def k(self) -> int:
        return self._k

    def get(self, kmer: int) -> bool:
        """Membership of a forward k-mer (canonicalizes, src/set/hash.rs:175-182)."""
        return codec.canonical(kmer, self._k) in self._set

    def set(self, kmer: int, value: bool = True) -> None:
        cano = codec.canonical(kmer, self._k)
        if value:
            self._set.add(cano)
        else:
            self._set.discard(cano)

    def set_many(self, kmers: np.ndarray) -> None:
        if kmers.size:
            self._set.update(codec.canonical_np(kmers, self._k).tolist())

    def get_many(self, kmers: np.ndarray) -> np.ndarray:
        cano = codec.canonical_np(kmers, self._k)
        table = self.sorted_table()
        if table.size == 0:
            return np.zeros(cano.shape, dtype=bool)
        pos = np.minimum(np.searchsorted(table, cano), table.size - 1)
        return table[pos] == cano

    def __len__(self) -> int:
        return len(self._set)

    @classmethod
    def from_sequences(cls, seqs: Iterable[bytes], k: int) -> "HashSet":
        """All k-mers of all sequences (reference from_fasta, src/set/hash.rs:40-104)."""
        self = cls(k)
        for seq in seqs:
            if len(seq) >= k:
                arr = np.frombuffer(seq, dtype=np.uint8)
                self.set_many(codec.rolling_kmers_np(codec.encode_ascii_np(arr), k))
        return self

    @classmethod
    def from_csv(cls, stream, k: int) -> "HashSet":
        """First CSV column is a k-mer string; header row skipped
        (reference src/set/hash.rs:20-38)."""
        self = cls(k)
        first = True
        for line in stream:
            if isinstance(line, bytes):
                line = line.decode()
            line = line.strip()
            if not line:
                continue
            if first:
                first = False
                continue
            field = line.split(",")[0]
            if not field:
                from br_tpu.errors import CsvMissingFirstColumn

                raise CsvMissingFirstColumn()
            self.set(codec.seq2bit(field.encode()))
        return self

    def sorted_table(self) -> np.ndarray:
        """Sorted uint64 canonical k-mers for binary-search probes."""
        if not self._set:
            return np.zeros(0, dtype=np.uint64)
        return np.sort(np.fromiter(self._set, dtype=np.uint64, count=len(self._set)))

    def device_table(self) -> np.ndarray:
        """Sorted table padded to a power of two with an out-of-space sentinel."""
        if self._set:
            table = np.sort(np.fromiter(self._set, dtype=np.uint64, count=len(self._set)))
        else:
            table = np.zeros(0, dtype=np.uint64)
        sentinel = np.uint64(1) << np.uint64(min(2 * self._k + 1, 63))
        n = 1 << max(0, (int(table.size) - 1).bit_length())
        if n < max(1, table.size):
            n = table.size
        pad = np.full(max(1, n) - table.size, sentinel, dtype=np.uint64)
        return np.concatenate([table, pad])
